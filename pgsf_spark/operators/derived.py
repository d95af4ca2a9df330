"""Derived (formula) columns -- the 'compute locally' path for calculated
fields (P2 in SURVEY §2.3).

The reference excludes Salesforce formula fields from sync and tells the
operator to compute them locally (/root/reference/createtable.py:96-101
warnings). Here that's a first-class facility: a table's mapping can carry
`formula` notes, and apply_derived attaches them as Catalyst expressions --
evaluated at query time, never stored, so they can't go stale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class FormulaError(ValueError):
    pass


def apply_derived(df: DataFrame, formulas: dict[str, str]) -> DataFrame:
    """Attach derived columns from SQL expression strings.

    formulas: {column_name: sql_expression}. Expressions may reference any
    existing column and previously-declared derived columns (dict order).
    Fails loudly on unresolvable expressions (schema fixed after curation --
    SURVEY §1.1)."""
    out = df
    for name, expr in formulas.items():
        try:
            out = out.withColumn(name, F.expr(expr))
        except Exception as e:
            raise FormulaError(f"formula {name} = {expr!r} failed: {e}") from e
    return out

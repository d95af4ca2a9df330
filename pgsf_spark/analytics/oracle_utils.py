"""Helpers for oracle-exact aggregation.

Floating-point sums depend on accumulation order, which differs between
Spark's partial aggregation and DuckDB's scan order. For hash-exact parity
we accumulate in DECIMAL (exact, order-independent) and cast the final
result back to DOUBLE:

  Spark : SUM(CAST(x AS DECIMAL(18,4)))  -> CAST(... AS DOUBLE)
  DuckDB: CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)

The per-row double->decimal cast is deterministic and identical in both
engines (a double exactly on a decimal rounding boundary has measure zero),
and decimal addition is exact -- so the final double is bit-identical
regardless of partitioning. This also makes results *stable at any scale*,
which plain double sums are not.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,4)"


def dsum(col: Column, dec: str = DEC) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(col.cast(dec)).cast("double")


def davg(col: Column, dec: str = DEC, ndigits: int = 6) -> Column:
    """Order-independent mean: exact decimal sum / non-null count, rounded."""
    return F.round(F.sum(col.cast(dec)).cast("double") / F.count(col), ndigits)


def sql_dsum(expr: str, dec: str = "DECIMAL(27,4)") -> str:
    return f"CAST(SUM(CAST({expr} AS {dec})) AS DOUBLE)"


def sql_davg(expr: str, dec: str = "DECIMAL(27,4)", ndigits: int = 6) -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS {dec})) AS DOUBLE) / COUNT({expr}), {ndigits})"

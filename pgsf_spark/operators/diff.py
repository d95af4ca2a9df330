"""Snapshot reconciliation diff: added / removed / changed rows between two
versions of a table, with per-column change attribution.

The ops tool a replication engine owes its users: after a sync (or a
migration to this engine), prove the replica matches the source -- and when
it doesn't, say WHERE. One full-outer join on the primary key; per-column
comparison is a projection over the joined row (null-safe <=>, so
NULL -> value and value -> NULL count as changes); nothing is collected.
At 100 TB both sides shuffle once on the key -- or zero times if both live
in the bucketed store layout (operators/bucketed.py) with matching buckets.

Reference parity: pgsf trusts ON CONFLICT upserts and has no reconcile
step; the watermark discipline (csv_to_postgres.py:94) makes drift rare,
and this operator is how you PROVE absence of drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, pk: str, compare_cols: list[str] | None = None
) -> DataFrame:
    """Row-level diff keyed on ``pk``: one row per key present in either
    side, with status in {added, removed, changed, unchanged} and the list
    of changed column names. Presence comes from explicit side markers, not
    column nullability, so all-NULL rows diff correctly."""
    cols = compare_cols or [c for c in old.columns if c != pk and c in new.columns]
    o = old.select(
        pk, F.lit(True).alias("__in_old"), *[F.col(c).alias(f"__o_{c}") for c in cols]
    )
    n = new.select(
        pk, F.lit(True).alias("__in_new"), *[F.col(c).alias(f"__n_{c}") for c in cols]
    )
    j = o.join(n, pk, "full_outer")
    changed = F.array_compact(
        F.array(
            *[
                F.when(~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c))
                for c in cols
            ]
        )
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        pk,
        status.alias("status"),
        F.when(F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull(), changed)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )


def diff_column_counts(diff: DataFrame) -> DataFrame:
    """Per-column change attribution: how many rows changed in each column
    (exploded over changed_cols; map-side partials over a column-count key
    space)."""
    return (
        diff.select(F.explode("changed_cols").alias("col"))
        .groupBy("col")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_changed"))
    )

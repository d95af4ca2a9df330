"""Bucketed catalog tables: shuffle-free merges at scale.

The versioned TableStore clusters data by key (repartition before write),
which co-locates *within a job* but loses the layout metadata between jobs.
Spark bucketing (`bucketBy` + saveAsTable) persists the hash-partitioned
layout in the catalog, so a join/merge on the bucket key skips the exchange
for the bucketed side entirely -- at 100 TB this removes the only full-table
shuffle in the CDC merge.

Usage: bucketed replicas for the biggest tables; the change batch (small)
still shuffles/broadcasts, the target never does. Verified by
test_bucketed.py asserting the exchange disappears from the join plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and optionally sorted) catalog table.

    sort_cols gives clustering within buckets (the Z-ORDER-lite analogue for
    the mapping file's Indexed=1 columns): min/max row-group stats make
    point/range filters on those columns skip data."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    """Join two same-bucketed tables on the bucket key -- no exchange."""
    return spark.table(left_table).join(spark.table(right_table), on=on)

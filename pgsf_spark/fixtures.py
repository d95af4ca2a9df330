"""Entity-ification of plain tables (FIXTURES.md §1).

The correctness fixtures treat each TPC-H table as a replicated entity by
adding the three system columns the reference relies on:

  Id              -- string PK derived deterministically from the natural key
  SystemModstamp  -- CDC watermark column (UTC, second precision)
  IsDeleted       -- soft-delete flag (false in snapshots)

Composite keys concatenate with '-' (lineitem: '<orderkey>-<linenumber>').
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SNAPSHOT_TS = datetime(2023, 6, 1, 0, 0, 0)


def as_entity(df: DataFrame, key_cols: list[str], ts: datetime = SNAPSHOT_TS) -> DataFrame:
    """Add pgsf system columns to a plain table, deterministically."""
    id_col = F.concat_ws("-", *[F.col(c).cast("string") for c in key_cols])
    return (
        df.withColumn("Id", id_col)
        .withColumn("SystemModstamp", F.lit(ts).cast("timestamp"))
        .withColumn("IsDeleted", F.lit(False))
    )


STAR_KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
}

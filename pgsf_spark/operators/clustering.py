"""Z-order (Morton) clustering for multi-dimension data skipping.

Delta/Iceberg expose OPTIMIZE ... ZORDER BY; plain parquet gets the same
effect by sorting the write layout along an interleaved-bit curve, then
letting file-level min/max stats (table_store._write_file_stats) prune on
ANY of the participating columns. A linear sort clusters one column
perfectly and the others not at all; the Z-curve gives every dimension
~sqrt/ n-th-root locality, which is what multi-predicate range lookups on a
100 TB fact table need.

All pure JVM expressions (shiftleft / shiftright / bitwise OR) -- the
z-value never leaves the executors and is dropped before the write.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 12  # 4096 cells/dim; 3 cols x 12 bits = 36 bits < long


def scale_to_int(col: Column, lo: Column, hi: Column, bits: int = DEFAULT_BITS) -> Column:
    """Min-max scale a numeric/timestamp column onto [0, 2^bits - 1].

    Nulls map to 0 (cluster with the minimum -- they must land somewhere
    deterministic). Degenerate range (lo == hi) maps everything to 0."""
    maxv = (1 << bits) - 1
    c = col.cast("double")
    lo_d, hi_d = lo.cast("double"), hi.cast("double")
    span = hi_d - lo_d
    scaled = F.when(span > 0, ((c - lo_d) / span) * maxv).otherwise(F.lit(0.0))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(maxv)))
    return F.coalesce(F.round(clamped).cast("long"), F.lit(0))


def interleave_bits(cols: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave: bit b of column j lands at position b*ncols + j.
    Inputs must already be longs in [0, 2^bits)."""
    n = len(cols)
    assert n * bits <= 62, f"z-value would overflow a long: {n} cols x {bits} bits"
    terms = [
        F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + j)
        for j, c in enumerate(cols)
        for b in range(bits)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    num_files: int | None = None,
) -> DataFrame:
    """Cluster ``df`` along the Z-curve of ``cols``.

    One extra aggregation job computes the global min/max per column (the
    scaling anchors); then a single range-shuffle on the z-value orders the
    data so each output file covers a compact hyper-rectangle. At 100 TB
    the agg is a partial-agg scan (cheap) and the shuffle is the same cost
    as any repartition -- run it at compaction time, not per-merge."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    rng = df.agg(*aggs).first()
    scaled = [
        scale_to_int(F.col(c), F.lit(rng[f"__lo_{c}"]), F.lit(rng[f"__hi_{c}"]), bits)
        for c in cols
    ]
    z = df.withColumn("__z", interleave_bits(scaled, bits))
    n = num_files or df.rdd.getNumPartitions()
    return z.repartitionByRange(n, "__z").sortWithinPartitions("__z").drop("__z")


def zorder_within(
    df: DataFrame,
    cols: list[str],
    partition_by: list[str],
    bits: int = DEFAULT_BITS,
    num_files: int | None = None,
) -> DataFrame:
    """Z-cluster INSIDE each hive partition of a partitioned table.

    zorder()'s global repartitionByRange lays rows out by z-value alone; a
    later repartition by the hive partition columns (needed for dir-aligned
    writes) would reshuffle and destroy that order. Here ONE range shuffle
    is keyed by (partition cols, z): each task covers a contiguous slice of
    one partition's z-curve, so every directory gets ~num_files/n_dirs files
    each spanning a compact z-range -- which is what per-file min/max
    pruning inside a partition needs. Scaling anchors stay global so
    z-values are comparable across partitions."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    rng = df.agg(*aggs).first()
    scaled = [
        scale_to_int(F.col(c), F.lit(rng[f"__lo_{c}"]), F.lit(rng[f"__hi_{c}"]), bits)
        for c in cols
    ]
    z = df.withColumn("__z", interleave_bits(scaled, bits))
    n = num_files or df.rdd.getNumPartitions()
    keys = [F.col(p) for p in partition_by] + [F.col("__z")]
    return (
        z.repartitionByRange(n, *keys)
        .sortWithinPartitions(*partition_by, "__z")
        .drop("__z")
    )

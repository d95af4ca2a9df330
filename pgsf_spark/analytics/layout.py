"""Data-layout planning: Z-order clustering and its file-skipping payoff.

At 100 TB the cheapest predicate is the one that never reads a file:
min/max footer stats prune whole files, but only if the write layout
clusters the filter columns. A single-column sort prunes that column and
destroys locality for every other; a Z-order (Morton) interleave gives
all interleaved columns partial locality, so multi-dimensional box
predicates skip most files. This module computes the layout *and* the
gate that measures the payoff, on the orders table:

  - px: 8-bit price bucket, py: 8-bit order-date bucket (fixed ranges,
    integer-exact in any engine);
  - z: bit-interleave of (px, py) -- a pure projection of 16 shifted
    terms, codegen'd JVM-side, no UDF;
  - file assignment: fixed value ranges of z (z >> 10 -> 64 files) and,
    for the contrast layout, fixed date ranges. Value-range bucketing is
    what `repartitionByRange(z)` converges to at scale, but is
    deterministic and window-free, so the gate is hash-exact;
  - the gate replays a box predicate against per-file min/max stats --
    exactly the pruning decision a parquet reader makes from footers.

The write-side operator is operators/clustering.py (zorder /
zorder_within, already wired into TableStore compaction); this module is
its *measurement gate*: the same Morton interleave (reused from
clustering.interleave_bits) driven through a deterministic, oracle-exact
replay of the pruning decision, so "z-order helps" is a hash-green number
rather than a claim. The whole query is two projections and one
(layout, file) shuffle of bucket-stat rows; nothing global, nothing on
the driver. Reference scope: the reference engine has no layout planner
(its sink is a row-at-a-time COPY, `/root/reference/synctable.py`); this
is part of the 100-TB-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgsf_spark.operators.clustering import interleave_bits
from pgsf_spark.tables import load_table

EPOCH = "1995-01-01"  # corpus date floor (TESTDATA is fixed-seed synthetic)
PRICE_STEP = 2000  # 8-bit price bucket width
DAY_STEP = 10  # 8-bit date bucket width
N_FILES = 64  # 16-bit z-space split into 64 fixed ranges -> z >> 10
# Box predicate the gate replays: mid-range prices in a ~1.6-year window.
PX_LO, PX_HI = 50, 99
PY_LO, PY_HI = 120, 179


def q_zorder_skipping_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Files/rows a box predicate scans under z-order vs single-column layout.

    Output: one row per layout with file and row skipping stats; the
    matched-row count is layout-independent (correctness anchor) while the
    scanned volume is the layout's cost.
    """
    o = load_table(spark, sf_dir, "orders")
    px = F.least(F.lit(255), F.floor(F.col("o_totalprice") / PRICE_STEP)).cast("int")
    py = F.least(
        F.lit(255),
        F.floor(F.datediff(F.col("o_orderdate"), F.lit(EPOCH).cast("date")) / DAY_STEP),
    ).cast("int")
    base = o.select(
        px.alias("px"),
        py.alias("py"),
    ).select(
        "px",
        "py",
        F.shiftright(interleave_bits([F.col("px"), F.col("py")], bits=8), 10).alias("fid_z"),
        # contrast layout: files laid out by date alone (same 64-file budget)
        F.least(F.lit(N_FILES - 1), F.floor(F.col("py") / F.lit(4))).cast("int").alias("fid_lin"),
        (
            F.col("px").between(PX_LO, PX_HI) & F.col("py").between(PY_LO, PY_HI)
        ).cast("int").alias("hit"),
    )
    per_layout = base.select(
        F.explode(
            F.array(
                F.struct(F.lit("zorder").alias("layout"), F.col("fid_z").alias("fid")),
                F.struct(F.lit("linear").alias("layout"), F.col("fid_lin").alias("fid")),
            )
        ).alias("lf"),
        "px",
        "py",
        "hit",
    ).select(F.col("lf.layout").alias("layout"), F.col("lf.fid").alias("fid"), "px", "py", "hit")

    stats = per_layout.groupBy("layout", "fid").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("hit").alias("n_hits"),
        F.min("px").alias("min_px"),
        F.max("px").alias("max_px"),
        F.min("py").alias("min_py"),
        F.max("py").alias("max_py"),
    )
    scanned = (
        (F.col("min_px") <= PX_HI)
        & (F.col("max_px") >= PX_LO)
        & (F.col("min_py") <= PY_HI)
        & (F.col("max_py") >= PY_LO)
    ).cast("int")
    return (
        stats.withColumn("scanned", scanned)
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("files_total"),
            F.sum("scanned").alias("files_scanned"),
            F.sum(F.col("scanned") * F.col("n_rows")).alias("rows_scanned"),
            F.sum("n_hits").alias("rows_matched"),
            F.round(
                F.lit(100.0) * (F.lit(1.0) - F.sum(F.col("scanned") * F.col("n_rows")) / F.sum("n_rows")),
                2,
            ).alias("pruned_pct"),
        )
        .orderBy("layout")
    )

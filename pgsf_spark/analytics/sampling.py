"""Deterministic sampling & dataset-split operators (training-data pipeline).

A 100 TB corpus is never split or sampled with rand(): task retries would
resample rows and splits would leak across runs. Everything here derives
from a content-stable md5 hash of the key, so results are reproducible
across runs, engines (DuckDB oracle uses the identical arithmetic), and
cluster sizes -- and no shuffle is needed for the assignment itself (pure
projection); only per-group sampling shuffles, on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pgsf_spark.tables import load_table

SPLIT_SEED = "split"
TRAIN_PCT, VAL_PCT = 80, 10  # remaining 10% = test


def _hash_pct(col, seed: str):
    """0..99 hash slot from md5 (engine-portable; same formula as the
    registry's _hash_sql)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string"))), 1, 8), 16, 10).cast(
        "long"
    )
    return h % 100


def assign_split(df: DataFrame, key: str, seed: str = SPLIT_SEED) -> DataFrame:
    """Add a ``split`` column: train/val/test by hash slot (80/10/10).

    Pure projection -- no shuffle, no state; a row's split is a function of
    its key alone, so late-arriving data lands in stable splits and the
    assignment survives repartitioning/retries."""
    slot = _hash_pct(F.col(key), seed)
    return df.withColumn(
        "split",
        F.when(slot < TRAIN_PCT, F.lit("train"))
        .when(slot < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split document counts + char volume: the sanity report every
    training run starts with."""
    d = load_table(spark, sf_dir, "documents")
    return (
        assign_split(d, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
        )
    )


def q_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document split assignment (the actual training-manifest join key)."""
    d = load_table(spark, sf_dir, "documents")
    return assign_split(d, "doc_id").select("doc_id", "split")


def sample_per_group(
    df: DataFrame, group_col: str, key_col: str, n: int, seed: str = "sample"
) -> DataFrame:
    """Deterministic n-per-group sample: rank by md5(key) inside each group,
    keep the first n. One shuffle on the group key; equivalent to a seeded
    reservoir sample but stable under retries and incremental reruns."""
    order = _hash_pct(F.col(key_col), seed) * 10_000_000 + F.col(key_col).cast("long")
    w = Window.partitionBy(group_col).orderBy(order.asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def q_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 deterministic sample docs per source (corpus inspection / eval-set
    drawing at fixed per-domain quota)."""
    d = load_table(spark, sf_dir, "documents")
    return sample_per_group(d, "source", "doc_id", 3).select("source", "doc_id")


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture rebalancing (alpha = 0.5): each source is
    downsampled to ceil(sqrt(n_source)) docs -- the multilingual-training
    trick that flattens a skewed source mixture without zeroing the tail.

    alpha = 0.5 specifically because sqrt is correctly rounded in IEEE 754,
    so Spark and any oracle engine agree bit-for-bit; arbitrary pow(n, a)
    would not. Selection is the deterministic hash-rank (no rand(), stable
    under retries); the only shuffle is the per-source window."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("temp:"), F.col("doc_id").cast("string"))), "doc_id"
    )
    ranked = d.select("doc_id", "source").withColumn("rk", F.row_number().over(w))
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    return (
        ranked.join(counts, "source")
        .filter(F.col("rk") <= F.ceil(F.sqrt(F.col("n_src"))))
        .select("doc_id", "source")
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling: priority = hash(doc_id) / weight,
    take the 100 lowest priorities (longer docs -- weight = n_chars -- are
    proportionally more likely to make the cut). The hash-priority trick is
    the distributed form of weighted reservoir sampling (Efraimidis &
    Spirakis order-sampling with a u/w priority key): no rand() state, so
    the sample is retry-stable and identical on any partitioning; the only
    cross-partition step is the top-k reduce (TakeOrderedAndProject).

    Output is the per-source composition of the sample plus its weight
    mass -- the rebalancing report a mixture tuner reads."""
    d = load_table(spark, sf_dir, "documents")
    u = F.conv(F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10).cast("double")
    picked = (
        d.select("doc_id", "source", F.col("n_chars").cast("double").alias("w"))
        .withColumn("priority", u / F.col("w"))
        .orderBy("priority", "doc_id")
        .limit(100)
    )
    return picked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.col("w").cast("bigint")).alias("weight_mass"),
        F.min("doc_id").alias("first_doc"),
    )


def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: for a fixed budget of
    1000 docs, allocate to each source proportionally to N_h * S_h (stratum
    size x stddev of n_chars) -- the allocation that minimizes the variance
    of the stratified length estimator. The principled version of ad-hoc
    per-source quotas for corpus mixing.

    Plan: one groupBy(source) computes exact decimal moments (count, sum,
    sum-of-squares -- mergeable partials, one shuffle bounded by the number
    of sources); the normalizing constant is a scalar agg over the tiny
    stratum table, broadcast back. Stddev comes from the moments via IEEE
    sqrt (deterministic in every engine); the weight total accumulates in
    decimal so allocation is partition-order-independent; floor (not round)
    for the integer allocation to avoid half-tie divergence.
    """
    d = load_table(spark, sf_dir, "documents")
    x = F.col("n_chars").cast("double")

    def s(e):
        return F.sum(e.cast("decimal(38,6)")).cast("double")

    n = F.count(F.lit(1)).cast("double")
    var = (s(x * x) - s(x) * s(x) / n) / (n - 1)
    per = (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sqrt(var).alias("sd"),
        )
        .filter(F.col("n_docs") > 1)
        .withColumn("w", F.col("n_docs").cast("double") * F.col("sd"))
    )
    tot = per.agg(F.sum(F.col("w").cast("decimal(27,4)")).cast("double").alias("wtot"))
    return (
        per.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round("sd", 4).alias("stddev_chars"),
            F.floor(F.lit(1000.0) * F.col("w") / F.col("wtot")).cast("bigint").alias("alloc_n"),
        )
        .orderBy("source")
    )


# --- deterministic Poisson bootstrap ----------------------------------------

BOOT_B = 32  # bootstrap replicas
# Poisson(1) CDF thresholds: a uniform u maps to weight = #thresholds <= u.
# Literal values are identical strings in the Spark and DuckDB faces, so the
# parsed doubles -- and therefore every replica -- are bit-identical.
BOOT_POIS_CDF = [
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
    "0.9999897508033253",
]


def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Poisson bootstrap (Chamandy et al., Google 2012 -- the
    resampling scheme that works on data too large to index): each row
    joins every replica b with weight ~ Poisson(1) derived from
    md5(b, key), so replicas are deterministic, engine-portable, and need
    NO global row count or shuffle of the fact table. Reports the point
    mean of o_totalprice with an order-statistic bootstrap interval
    (2nd/31st of 32 replica means ~ 94% CI).

    Scale shape: the B-way explode aggregates map-side to B keys, so the
    shuffle carries B rows per task regardless of corpus size; replica
    means use exact decimal sums (order-independent), and the final
    order-statistics run over a B-row table."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    reps = o.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.array(*[F.lit(b) for b in range(BOOT_B)])).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("boot"), F.col("b").cast("string"), F.lit(":"), F.col("o_orderkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = F.lit(len(BOOT_POIS_CDF))
    for k in range(len(BOOT_POIS_CDF) - 1, -1, -1):
        w = F.when(u < float(BOOT_POIS_CDF[k]), F.lit(k)).otherwise(w)
    means = (
        reps.withColumn("w", w)
        .groupBy("b")
        .agg(
            F.sum("w").cast("bigint").alias("sw"),
            F.sum((F.col("w") * F.col("o_totalprice")).cast("decimal(27,4)"))
            .cast("double")
            .alias("swx"),
        )
        .select("b", (F.col("swx") / F.col("sw")).alias("m"))
    )
    from pyspark.sql.window import Window

    ranked = means.withColumn("rn", F.row_number().over(Window.orderBy("m", "b")))
    ci = ranked.agg(
        F.count(F.lit(1)).cast("int").alias("n_replicas"),
        F.max(F.when(F.col("rn") == 2, F.col("m"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == BOOT_B - 1, F.col("m"))).alias("ci_hi"),
    )
    from pgsf_spark.analytics.oracle_utils import davg

    point = o.agg(davg(F.col("o_totalprice"), ndigits=4).alias("point_mean"))
    return ci.crossJoin(point).select("n_replicas", "point_mean", "ci_lo", "ci_hi")


def q_source_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-mixture budget enforcement: each source gets a character
    budget (2/5 of its total, integer division -- the mixture weights a
    data recipe prescribes), and docs are admitted in seeded shuffle-hash
    order until the running total would exceed it. The hash order makes
    the selection a uniform random sample that is identical on every rerun
    and resumable mid-epoch; the running total is one cumulative-sum
    window per source (shuffle on source only).

    Output: per-source admission accounting (budget, docs/chars admitted,
    utilization) -- the numbers a mixture dashboard tracks."""
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.concat(F.lit("bud3:"), F.col("doc_id").cast("string"))), 1, 12), 16, 10).cast("long")
    tot = Window.partitionBy("source")
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    sel = (
        d.select("doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars"), h.alias("h"))
        # integral `div`, not float `/` then cast: the oracle floors with
        # exact integer division, and double arithmetic diverges from it once
        # 2*sum(n_chars) exceeds 2^53 -- exactly the corpus scale this targets
        .withColumn("tot_chars", F.sum("n_chars").over(tot))
        .withColumn("budget", F.expr("(tot_chars * 2L) div 5L"))
        .withColumn("cum", F.sum("n_chars").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("admitted", F.col("cum") <= F.col("budget"))
    )
    return sel.groupBy("source").agg(
        F.first("budget").alias("budget_chars"),
        F.sum(F.when(F.col("admitted"), 1).otherwise(0)).alias("n_admitted"),
        F.sum(F.when(F.col("admitted"), F.col("n_chars")).otherwise(0)).alias("chars_admitted"),
        F.count(F.lit(1)).alias("n_total"),
        F.round(
            F.sum(F.when(F.col("admitted"), F.col("n_chars")).otherwise(0))
            / F.first("budget"),
            4,
        ).alias("utilization"),
    )


KFOLD_K = 5  # cross-validation folds
KFOLD_SEED = "kf5"


def q_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold cross-validation assignment: within every stratum
    (source), docs are ordered by a seeded content hash and dealt
    round-robin into k folds -- so every fold holds floor/ceil(n_s/k) docs
    of EVERY stratum (hash-slot splits only approximate this; CV demands it
    exactly). Same retry-stable determinism contract as dataset_split: the
    assignment is a pure function of (doc_id, source), never of rand() or
    partitioning.

    Plan: one shuffle on source for the rank window (the assignment
    itself), then a (source, fold) rollup and a k-row fold summary -- the
    second aggregate runs on |sources| x k rows, nothing at corpus scale.
    Output per fold: doc/char counts, strata touched, and the max-min
    per-stratum imbalance (the CV balance guarantee: always 0 or 1)."""
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{KFOLD_SEED}:"), F.col("doc_id").cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    assigned = d.select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars"), h.alias("h")
    ).withColumn("fold", (F.row_number().over(w) - 1) % KFOLD_K)
    per_stratum = assigned.groupBy("fold", "source").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
    )
    return (
        per_stratum.groupBy("fold")
        .agg(
            F.sum("n").alias("n_docs"),
            F.sum("chars").alias("n_chars"),
            F.count(F.lit(1)).alias("n_strata"),
            (F.max("n") - F.min("n")).alias("stratum_imbalance"),
        )
        .orderBy("fold")
    )


IPF_ROUNDS = 3  # row/column scaling alternations (100-cell table: converges fast)


def q_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) of the source x lang
    contingency table to uniform marginals: the survey-weighting / dataset-
    mixture device that answers "what per-cell sampling weights make every
    source AND every language carry equal mass, while distorting the joint
    distribution as little as possible" (the weights IPF converges to are
    the max-entropy solution). IPF_ROUNDS alternations of row-scale /
    column-scale, the same unrolled iterative template as kmeans/pagerank.

    Scale shape: ONE corpus aggregate builds the |sources| x |langs| cell
    table (~100 rows); every round after is joins + aggregates over that
    tiny relation. Per-round row/column sums accumulate in DECIMAL and each
    half-round's weights are rounded to 12 digits, so the unrolled DuckDB
    CTEs reproduce the trajectory bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    cells = (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("w", F.col("n").cast("double"))
        .localCheckpoint(eager=True)
    )
    tot = cells.agg(
        F.sum("n").alias("t"),
        F.countDistinct("source").alias("ns"),
        F.countDistinct("lang").alias("nl"),
    )

    def _dsum12(col):
        return F.sum(F.col(col).cast("decimal(38,12)")).cast("double")

    for _ in range(IPF_ROUNDS):
        rs = cells.groupBy("source").agg(_dsum12("w").alias("rs"))
        cells = (
            cells.join(rs, "source")
            .crossJoin(F.broadcast(tot))
            .select(
                "source",
                "lang",
                "n",
                F.round(F.col("w") * ((F.col("t") / F.col("ns")) / F.col("rs")), 12).alias("w"),
            )
        )
        cs = cells.groupBy("lang").agg(_dsum12("w").alias("cs"))
        cells = (
            cells.join(cs, "lang")
            .crossJoin(F.broadcast(tot))
            .select(
                "source",
                "lang",
                "n",
                F.round(F.col("w") * ((F.col("t") / F.col("nl")) / F.col("cs")), 12).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
    return cells.select(
        "source", "lang", "n", F.round("w", 8).alias("weight")
    ).orderBy("source", "lang")


def adaptive_slots(n_rows: int, target: int) -> int:
    """Slot count (of 256) selecting ~``target`` rows from ``n_rows`` via a
    1-byte md5 slot -- the ABSOLUTE-size sampling device: a fixed slot
    count is a fixed FRACTION, which grows samples (and anything quadratic
    in them) with the corpus; adapting the count keeps the sample constant
    at any scale. Shared by the LSH recall audit, personalized PageRank
    seeds, and negative mining."""
    n = max(n_rows, 1)
    return max(1, min(256, (256 * target + n - 1) // n))


def md5_slot(col, seed: str):
    """The matching deterministic 0..255 slot for ``adaptive_slots``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string"))), 1, 2), 16, 10
    ).cast("int")


NEG_SEED = "neg6"
NEG_ANCHOR_TARGET = 40  # ABSOLUTE anchor count; md5 slots adapt to corpus size
NEG_POOL_TARGET = 600  # ABSOLUTE shared-pool size
NEG_K = 5  # negatives drawn per anchor


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hard-negative mining for contrastive training: each
    seeded anchor document draws NEG_K negatives from a shared seeded
    candidate pool, excluding its own source (the cheap same-source
    positive proxy), ordered by a per-(anchor, candidate) hash -- the
    in-batch-negatives builder every embedding-training pipeline needs,
    retry-stable because nothing uses engine RNG.

    Scale shape: anchors and pool are md5-slot projections whose slot
    counts adapt to the corpus size (ceil(256*TARGET/n_docs)), so both
    stay ABSOLUTE-size -- a fixed-fraction version measured 2.9x
    superlinear at 10x because anchors x pool grows quadratically; with
    absolute targets the pairing is a bounded broadcast at any corpus
    size. The per-anchor top-K is one window over pool-bounded groups;
    no shuffle touches the full corpus beyond the single scan (plus one
    bounded driver count, the pagerank node-count device)."""
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    anchors = d.filter(
        md5_slot(F.col("doc_id"), f"{NEG_SEED}a") < adaptive_slots(n_docs, NEG_ANCHOR_TARGET)
    ).select(F.col("doc_id").alias("anchor_id"), F.col("source").alias("anchor_source"))
    pool = d.filter(
        md5_slot(F.col("doc_id"), f"{NEG_SEED}p") < adaptive_slots(n_docs, NEG_POOL_TARGET)
    ).select(F.col("doc_id").alias("neg_id"), F.col("source").alias("neg_source"))
    pair_h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{NEG_SEED}:"),
                    F.col("anchor_id").cast("string"),
                    F.lit(":"),
                    F.col("neg_id").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("anchor_id").orderBy("h", "neg_id")
    return (
        anchors.crossJoin(F.broadcast(pool))
        .filter(
            (F.col("neg_source") != F.col("anchor_source"))
            & (F.col("neg_id") != F.col("anchor_id"))
        )
        .select("anchor_id", "anchor_source", "neg_id", "neg_source", pair_h.alias("h"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= NEG_K)
        .select("anchor_id", "anchor_source", "rank", "neg_id", "neg_source")
    )


WSAMPLE_SEED = "ws6"
WSAMPLE_K = 25


def q_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-Spirakis
    one-pass key trick: each item draws u from a seeded md5 hash and gets
    key = ln(u)/w (the log form of u^(1/w)); the global top-K keys ARE a
    weighted sample without replacement -- the distributed answer to
    "sample 25 documents proportional to length" that needs no sequential
    pass, no rejection loop, and no engine RNG (retry-stable).

    Determinism: u = (h+1)/2^32 from the md5 hash is exact; ln(u) rounds
    to DECIMAL(18,9) before the division (the house ln-portability device
    -- a sub-ulp libm difference cannot survive the rounding), the key
    rounds to 12, ties break by doc_id. Plan: one scan + TakeOrdered(K)
    -- a per-partition top-K then a K*partitions driver merge, the same
    shape at any scale."""
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{WSAMPLE_SEED}:"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h + 1) / F.lit(float(0x100000000))
    lnu = F.round(F.log(u), 9).cast("decimal(18,9)")
    key = F.round(lnu / F.col("n_chars").cast("double"), 12)
    ranked = d.select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars"), key.alias("k")
    ).orderBy(F.col("k").desc(), "doc_id")
    w = Window.orderBy(F.col("k").desc(), "doc_id")
    return (
        ranked.limit(WSAMPLE_K)
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "source", "n_chars", F.col("k").alias("es_key"))
    )

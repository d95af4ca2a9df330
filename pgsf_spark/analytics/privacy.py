"""Privacy / governance audits: k-anonymity and seeded-DP noisy release.

Training-data pipelines ship aggregate reports about corpora that contain
user data; before release two standard checks run: (1) a *k-anonymity
audit* -- does any quasi-identifier combination isolate fewer than k
records -- and (2) *differentially-private noisy counts* for the
released aggregates. Both are plain keyed aggregates (one shuffle on the
quasi-identifier/release key) and both are exactly reproducible:

- the audit is integer counting;
- the DP noise is Laplace via inverse-CDF over an md5-derived uniform
  (the same deterministic-randomness device as the sampling/bootstrap
  operators, dedup.py:_md5_hash_int): noise is a pure per-key expression,
  so the released table is stable across retries/partitionings and the
  DuckDB oracle reproduces it bit-for-bit. A production release would
  swap the seed for a secret drawn once; the MECHANISM (sensitivity-1
  count + Laplace(1/eps)) is the real thing.

Reference scope: the reference engine has no privacy tooling
(`/root/reference/query.py` stops at SOQL aggregates); this is part of
the extended data-governance brief for a 100 TB corpus engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgsf_spark.tables import load_table

K_ANON = 5  # the audit threshold
DP_EPS = 0.5  # epsilon for the count release
DP_SEED = "dp-r4"  # release-batch seed; secret in production
ACCTBAL_BUCKET = 1000  # quasi-identifier coarsening step


def _quasi(df: DataFrame) -> DataFrame:
    """Quasi-identifier projection: nation x segment x coarsened balance.
    Coarsening (bucketing the continuous column) is itself the first
    k-anonymity lever; the audit below measures whether it was enough."""
    return df.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / ACCTBAL_BUCKET).cast("int").alias("bal_bucket"),
    )


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-equivalence-class audit rollup: how many quasi-identifier
    classes exist, how many fall below k, and how many records they
    expose. One row -- the go/no-go a release gate consumes.

    Two aggregates: groupBy(quasi-ids) then a single-row rollup; at 100 TB
    the first is an ordinary partial-agg shuffle on the class key."""
    classes = _quasi(load_table(spark, sf_dir, "customer")).groupBy(
        "nation", "segment", "bal_bucket"
    ).agg(F.count(F.lit(1)).alias("n"))
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("n").alias("min_class_size"),
        F.sum((F.col("n") < K_ANON).cast("int")).alias("classes_below_k"),
        F.sum(F.when(F.col("n") < K_ANON, F.col("n")).otherwise(F.lit(0))).alias(
            "records_at_risk"
        ),
        F.round(
            F.sum(F.when(F.col("n") < K_ANON, F.col("n")).otherwise(F.lit(0)))
            / F.sum("n")
            * 100,
            4,
        ).alias("at_risk_pct"),
    )


def q_dp_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-noised per-segment customer counts (sensitivity-1 counting
    query, eps = DP_EPS), plus the true count so the gate exposes the
    noise that was actually added. Inverse-CDF Laplace:

        u ~ Uniform(0,1) from md5(seed, segment); centered at 0.5;
        noise = -(1/eps) * sign(u-0.5) * ln(1 - 2|u-0.5|)

    The ln() runs once per released key (|segments| rows), not per record,
    so engine libm parity is a per-key concern, guarded by rounding the
    release to 4 decimals."""
    seg = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(DP_SEED + ":"), F.col("segment"))), 1, 8), 16, 10)
        .cast("long")
        / F.lit(4294967296.0)
    )
    c = u - F.lit(0.5)
    noise = (
        F.lit(-1.0 / DP_EPS)
        * F.signum(c)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(c))
    )
    return seg.select(
        "segment",
        "true_count",
        F.round(noise, 4).alias("noise"),
        F.round(F.col("true_count") + noise, 4).alias("released_count"),
    ).orderBy("segment")


PSEUD_SEED = "pseud-r4"  # tokenization key; a secret in production
PSEUD_LEN = 16  # hex chars kept per token (64 bits)


def q_pseudonymize_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudonymization with referential integrity: direct
    identifiers (name, phone) are replaced by keyed-hash tokens
    (md5(seed || pk), truncated) -- the de-identification pass run before
    a corpus with user data leaves its trust boundary. Deterministic
    tokens keep JOINS working: the same entity gets the same token in
    every table and every run, so downstream analytics are unchanged
    while raw identifiers never leave the scan projection.

    The gate emits a per-nation audit: row count, distinct tokens
    (= rows proves collision-free tokenization at this scale), and a
    positional checksum over tokens (order-insensitive sum of md5-derived
    ints) so the driver hash pins the exact token values. One keyed
    shuffle; the token is a scan-side projection -- at 100 TB this runs
    at I/O speed with zero joins."""
    c = load_table(spark, sf_dir, "customer")
    token = F.substring(
        F.md5(F.concat(F.lit(PSEUD_SEED + ":"), F.col("c_custkey").cast("string"))),
        1,
        PSEUD_LEN,
    )
    pseud = c.select(
        F.col("c_nationkey").cast("int").alias("nationkey"),
        token.alias("token"),
    )
    tok_int = F.conv(F.substring("token", 1, 8), 16, 10).cast("bigint")
    return pseud.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("token").alias("n_tokens"),
        F.sum(tok_int).alias("token_checksum"),
    )


GDPR_SEED = "gdpr-r5"
GDPR_SLOTS = 8  # of 256: ~3% of customers request erasure


def q_cascade_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact audit: given a deterministic erasure
    cohort (customers whose seeded hash slot < GDPR_SLOTS/256 -- standing in
    for an actual request list), count every row the referential cascade
    would remove: the customers themselves, their orders, and those orders'
    lineitems. The dry-run report a deletion pipeline MUST produce before
    executing (the execute side is operators/deletion.delete_rows).

    Plan: the cohort predicate is a scan-side projection on customer (no
    join to find victims); orders filter by one semi-join on o_custkey,
    lineitems by a second on l_orderkey -- each shuffles only the join keys
    and AQE broadcasts the victim side when small. The per-table totals for
    the pct come from footer-count aggregates (COUNT(*) pushdown), so the
    audit never full-scans a table it isn't erasing from."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    slot = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{GDPR_SEED}:"), F.col("c_custkey").cast("string"))), 1, 2),
        16,
        10,
    ).cast("int")
    victims = c.select("c_custkey").filter(slot < GDPR_SLOTS)
    v_orders = o.join(victims, o.o_custkey == victims.c_custkey, "left_semi")
    v_line = li.join(
        v_orders.select("o_orderkey"), li.l_orderkey == v_orders.o_orderkey, "left_semi"
    )

    def row(entity: str, erased: DataFrame, total: DataFrame) -> DataFrame:
        e = erased.agg(F.count(F.lit(1)).alias("n_erased"))
        t = total.agg(F.count(F.lit(1)).alias("n_total"))
        return e.crossJoin(t).select(
            F.lit(entity).alias("entity"),
            "n_erased",
            "n_total",
            # try_divide: an empty table yields NULL pct on both faces
            # (DuckDB's x/0 is NULL) instead of an ANSI divide-by-zero
            F.round(F.try_divide(F.col("n_erased"), F.col("n_total")), 6).alias("pct"),
        )

    return (
        row("customer", victims, c)
        .unionByName(row("orders", v_orders, o))
        .unionByName(row("lineitem", v_line, li))
    )


L_DIV = 3  # distinct-sensitive-values floor per equivalence class


def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the same quasi-identifier classes as the
    k-anonymity gate: k-anonymity counts ROWS per class (re-identification
    risk), l-diversity counts DISTINCT SENSITIVE VALUES per class
    (attribute-disclosure risk -- a class of 50 people all sharing one
    exact balance leaks the balance even though k=50 passes). Sensitive
    attribute here: the exact account balance.

    Same scale shape as q_k_anonymity_audit: one groupBy on the class key
    carrying a COUNT plus a COUNT DISTINCT, then a single-row rollup."""
    classes = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / ACCTBAL_BUCKET).cast("int").alias("bal_bucket"),
            F.col("c_acctbal").alias("sens"),
        )
        .groupBy("nation", "segment", "bal_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("sens").alias("l"))
    )
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("l").alias("min_diversity"),
        F.sum((F.col("l") < L_DIV).cast("int")).cast("bigint").alias("classes_below_l"),
        F.sum(F.when(F.col("l") < L_DIV, F.col("n")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("records_at_risk"),
        F.round(
            F.sum(F.when(F.col("l") < L_DIV, F.col("n")).otherwise(F.lit(0)))
            / F.sum("n")
            * 100,
            4,
        ).alias("at_risk_pct"),
    )


T_CLOSE = 0.2  # max tolerated EMD between class and global sensitive dists


def q_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit completing the privacy triad (k-anonymity counts
    rows per class, l-diversity counts distinct sensitive values,
    t-closeness bounds the DISTANCE between each class's sensitive-value
    distribution and the global one -- a class can be large AND diverse yet
    still leak if its balances all cluster at the top). Quasi-identifier
    class here is (nation, segment) -- the balance is the sensitive
    attribute, so unlike the k-anon/l-div gates it is NOT part of the
    class key. Distance is the ordered-attribute Earth Mover's Distance of
    Li et al.: EMD = sum_i |cumP_i - cumQ_i| / (m-1) over the m
    ACCTBAL_BUCKET-grain buckets.

    Exactness: every |cumP - cumQ| is carried as the EXACT integer
    |cum_c*N - cum_g*n_c| (class cumulative times grand total minus global
    cumulative times class total; products in DECIMAL(38,0) so 100 TB row
    counts cannot overflow), and each class's EMD is ONE double division
    of two exact integers -- bit-identical cross-engine. Per-class EMDs
    are rounded to 9 and decimal-summed for the average.

    Scale shape: one groupBy to (class, bucket) cells, the global bucket
    margin is a broadcast (m rows), the class x bucket grid is
    dimension-sized (|classes| * m), and the cumulative window partitions
    BY CLASS over m rows -- no single-partition window, no all-pairs."""
    from pyspark.sql.window import Window

    cells = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / ACCTBAL_BUCKET).cast("int").alias("sb"),
        )
        .groupBy("nation", "segment", "sb")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cls_tot = cells.groupBy("nation", "segment").agg(F.sum("c").alias("nc"))
    glob = cells.groupBy("sb").agg(F.sum("c").alias("g"))
    tot = glob.agg(
        F.sum("g").alias("n_total"), F.count(F.lit(1)).alias("m_buckets")
    )
    grid = (
        cls_tot.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["nation", "segment", "sb"], "left")
        .select(
            "nation",
            "segment",
            "sb",
            "nc",
            "g",
            "n_total",
            "m_buckets",
            F.coalesce("c", F.lit(0)).alias("c"),
        )
    )
    w = (
        Window.partitionBy("nation", "segment")
        .orderBy("sb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dec = "decimal(38,0)"
    num = F.abs(
        F.sum("c").over(w).cast(dec) * F.col("n_total").cast(dec)
        - F.sum("g").over(w).cast(dec) * F.col("nc").cast(dec)
    )
    per_class = (
        grid.withColumn("num", num)
        .groupBy("nation", "segment")
        .agg(
            F.first("nc").alias("nc"),
            F.first("n_total").alias("n_total"),
            F.first("m_buckets").alias("m_buckets"),
            F.sum("num").alias("emd_num"),
        )
        .select(
            "nc",
            F.round(
                F.col("emd_num").cast("double")
                / (
                    F.col("nc").cast(dec)
                    * F.col("n_total").cast(dec)
                    * (F.col("m_buckets") - 1).cast(dec)
                ).cast("double"),
                9,
            ).alias("emd"),
        )
    )
    return per_class.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum((F.col("emd") > T_CLOSE).cast("int")).cast("bigint").alias("classes_above_t"),
        F.sum(F.when(F.col("emd") > T_CLOSE, F.col("nc")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("records_above_t"),
        F.round(F.max("emd"), 9).alias("max_emd"),
        F.round(F.sum(F.col("emd").cast("decimal(18,9)")).cast("double") / F.count(F.lit(1)), 9).alias(
            "avg_emd"
        ),
    )

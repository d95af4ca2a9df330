"""Table profiling: per-column statistics in one pass (data-quality gate).

One aggregate job computes null count / distinct count / min / max per
column, then unpivots to a (column, stat...) long format. Single shuffle,
no per-column scans -- the standard profiling shape at scale (distinct
counts per column are exact here; swap in approx_count_distinct at 100 TB,
noted below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pgsf_spark.analytics.oracle_utils import dsum
from pgsf_spark.tables import load_table


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: n_null, n_distinct, min/max (as strings).

    Exact distinct counts require one expand per column (Spark rewrites
    multi-distinct via expand) -- fine to ~dozens of columns; at very wide
    tables or 100 TB use approx_count_distinct instead (1 pass, no expand).
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs)
    # unpivot driver-side column *names* only (metadata, not data)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__nulls").cast("long").alias("n_null"),
            F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def q_profile_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile(load_table(spark, sf_dir, "customer"))


def q_price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation computed from exact decimal moments.

    Built-in corr() accumulates doubles (order-dependent, engine-divergent);
    assembling it from decimal Σx, Σy, Σxy, Σx², Σy² keeps the result
    bit-identical across engines and cluster sizes -- the same trick
    oracle_utils uses for sums, applied to second moments."""
    li = load_table(spark, sf_dir, "lineitem")

    def s(col_expr, dec="decimal(38,6)"):
        return F.sum(col_expr.cast(dec)).cast("double")

    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    n = F.count(F.lit(1)).cast("double")
    num = n * s(x * y) - s(x) * s(y)
    den = F.sqrt(n * s(x * x) - s(x) * s(x)) * F.sqrt(n * s(y * y) - s(y) * s(y))
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(num / den, 6).alias("corr_qty_price"), F.count(F.lit(1)).alias("n"))
    )


KMV_K = 64


def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch, oracle-exact.

    KMV: hash every key to (0,1], keep the k smallest distinct hashes; the
    estimate is (k-1)/h_k where h_k is the k-th minimum. Because the hash is
    md5-derived (not engine RNG), the sketch -- and therefore the estimate
    -- is bit-identical in DuckDB, unlike HLL (approx_distinct_users, which
    can only be rows-only checked). Mergeable at scale: per-partition k-min
    sets union and re-truncate, which is exactly what the global top-k sort
    below does."""
    ev = load_table(spark, sf_dir, "events")
    h = (
        F.conv(F.substring(F.md5(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(0x100000000))
    )
    hashes = ev.select(F.col("user_id")).distinct().select(h.alias("h")).orderBy("h").limit(KMV_K)
    agg = hashes.agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("k"))
    exact = ev.agg(F.count_distinct("user_id").alias("exact"))
    return agg.crossJoin(exact).select(
        F.when(F.col("k") < KMV_K, F.col("k").cast("double"))
        .otherwise(F.round((F.col("k") - 1) / F.col("hk"), 4))
        .alias("kmv_estimate"),
        F.col("exact").alias("exact_users"),
    )


def q_value_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev from exact decimal moments (same rationale as the
    correlation query: built-in stddev accumulates doubles and diverges
    across engines/partitionings)."""
    o = load_table(spark, sf_dir, "orders")

    def s(col_expr):
        return F.sum(col_expr.cast("decimal(38,6)")).cast("double")

    x = F.col("o_totalprice")
    n = F.count(F.lit(1)).cast("double")
    var = (s(x * x) - s(x) * s(x) / n) / (n - 1)
    return (
        o.groupBy("o_orderstatus")
        .agg(F.round(F.sqrt(var), 4).alias("stddev_price"), F.count(F.lit(1)).alias("n"))
    )


def q_name_min_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-similarity operator: each supplier's nearest other supplier
    name by Levenshtein distance, BLOCKED so the self-join is an equi-join.

    Blocking key = deletion neighborhood (the SymSpell idea): every string
    emits itself plus each delete-one-character variant; two strings within
    edit distance 1 (sub/ins/del) are GUARANTEED to share a variant, so the
    candidate join on the variant key is exact for radius 1 (generalize to
    radius k with k deletions). This replaces the r2 all-pairs
    BroadcastNestedLoopJoin: candidate pairs are found by a hash equi-join
    whose block sizes are bounded by the variant fan-in, not O(n^2) -- the
    registry's scale template for string similarity. Output: suppliers with
    at least one radius-1 neighbor and their exact min distance."""
    s = load_table(spark, sf_dir, "supplier")
    # sequence(0, len) inclusive: i == len yields the original string
    # (substr past the end is empty), covering the insert/delete pairing.
    variants = s.select(
        F.col("s_suppkey").alias("k"),
        F.col("s_name").alias("n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.length("s_name")),
                lambda i: F.concat(
                    F.col("s_name").substr(F.lit(1), i),
                    F.col("s_name").substr(i + F.lit(2), F.length("s_name")),
                ),
            )
        ).alias("variant"),
    )
    a = variants.select(F.col("k").alias("ka"), F.col("n").alias("na"), "variant")
    b = variants.select(F.col("k").alias("kb"), F.col("n").alias("nb"), "variant")
    pairs = (
        a.join(b, on="variant")
        .filter(F.col("ka") != F.col("kb"))
        .select("ka", "na", "nb")
        .distinct()
    )
    return (
        pairs.select("ka", F.levenshtein("na", "nb").alias("d"))
        .groupBy(F.col("ka").alias("s_suppkey"))
        .agg(F.min("d").alias("min_edit_distance"))
    )


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profiling per event type: median/MAD (median absolute
    deviation) with a 3-MAD fence -- the outlier detector that survives the
    heavy tails that break mean/stddev fences.

    Exact medians here (percentile is an exact interpolated rank; two
    shuffles on the small event_type key + one broadcast join back); at
    100 TB swap percentile for approx_percentile and this becomes the
    mergeable-sketch plan with the same output columns (the
    approx_percentile_gate query is the accuracy evidence for that swap).
    Median and MAD are rounded to 6dp BEFORE the fence comparison so the
    boundary is the same number in every engine."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    d = ev.select("event_type", "value").join(F.broadcast(med), "event_type")
    mad = d.groupBy("event_type", "med").agg(
        F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad")
    )
    return (
        d.join(F.broadcast(mad.select("event_type", "mad")), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


def q_kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA: union / intersection / Jaccard estimates
    between two user segments (viewers vs purchasers), with the exact
    intersection alongside -- the mergeable-sketch operation an audience-
    overlap or cross-corpus-dedup report runs without ever materializing
    the full sets.

    KMV theory: keep the k smallest md5-derived hashes per segment; the
    union sketch is the k smallest of the combined sketches (this is the
    sketch MERGE -- associative, so per-partition sketches combine
    losslessly at any cluster size); rho = fraction of union-sketch hashes
    present in both sides estimates Jaccard; intersection = rho x union
    estimate. Hashes are md5-derived (not engine RNG), so every number
    here is bit-identical in DuckDB -- a sketch pipeline that is still
    hash-exact oracle-checkable. Segments with < k keys degrade to exact
    sets (the CASE guard), so the estimates are exact at tiny scale.

    Plan: two distinct-aggregates + tiny top-k sorts (k=64 rows); all
    joins are on 64-row sketches. The events table is scanned once and
    everything downstream is sketch-sized.
    """
    K = KMV_K
    ev = load_table(spark, sf_dir, "events")
    h = (
        F.conv(F.substring(F.md5(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(0x100000000))
    )
    seg = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .select("event_type", "user_id")
        .distinct()
        .select("event_type", h.alias("h"))
    )
    # materialize the two K-row sketches: a and b each feed their own
    # estimator AND the union sketch (and rho reads u against both), so
    # without this every reference re-runs the corpus distinct -- the whole
    # point of a KMV sketch is that downstream algebra touches K rows, and
    # now the plan matches the docstring's "events table is scanned once
    # (per segment)" claim
    a = (
        seg.filter(F.col("event_type") == "view")
        .select("h")
        .orderBy("h")
        .limit(K)
        .localCheckpoint(eager=True)
    )
    b = (
        seg.filter(F.col("event_type") == "purchase")
        .select("h")
        .orderBy("h")
        .limit(K)
        .localCheckpoint(eager=True)
    )
    u = a.union(b).distinct().orderBy("h").limit(K)

    def est(df):
        return df.agg(F.count(F.lit(1)).alias("k"), F.max("h").alias("hk")).select(
            F.when(F.col("k") < K, F.col("k").cast("double"))
            .otherwise(F.round((F.col("k") - 1) / F.col("hk"), 4))
            .alias("e"),
            "k",
        )

    ea = est(a).select(F.col("e").alias("est_view"))
    eb = est(b).select(F.col("e").alias("est_purchase"))
    eu = est(u).select(F.col("e").alias("est_union"), F.col("k").alias("ku"))
    rho_cnt = (
        u.join(a, "h", "left_semi").join(b, "h", "left_semi")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = (
        seg.groupBy("h")
        .agg(F.count_distinct("event_type").alias("n_types"))
        .filter(F.col("n_types") == 2)
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersection"))
    )
    return (
        ea.crossJoin(eb).crossJoin(eu).crossJoin(rho_cnt).crossJoin(exact)
        .select(
            "est_view",
            "est_purchase",
            "est_union",
            # ku == 0 only when both segments are empty (fresh deployment):
            # emit NULL instead of tripping ANSI divide-by-zero
            F.when(F.col("ku") > 0, F.round(F.col("c") / F.col("ku"), 4)).alias("jaccard_est"),
            F.when(
                F.col("ku") > 0, F.round(F.col("c") / F.col("ku") * F.col("est_union"), 4)
            ).alias("est_intersection"),
            "exact_intersection",
        )
    )


HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.709  # standard alpha_64 constant


def q_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog reimplemented ENGINE-PORTABLY, so even the sketch is
    hash-exact against the oracle (unlike approx_count_distinct, whose HLL
    is engine-internal and only tolerance-checkable).

    Construction, chosen so every step is bit-identical in any engine:
      - 32-bit md5-derived hash; low p bits pick the register, the
        remaining 26 bits feed rho = 1-based position of the first set bit
        (computed via bin/lpad/strpos STRING ops -- no log2);
      - register value M_j = max(rho); the HLL sum adds 2^-M_j, which is
        an EXACT double (reciprocal of a power of two), and 64 terms
        spanning 2^-27..1 fit in 33 < 53 mantissa bits, so the double sum
        is exact in ANY accumulation order -- no decimal crutch needed;
      - raw estimate alpha * m^2 / S emitted UNROUNDED (pure IEEE ops on
        identical inputs; the small-range ln() correction is deliberately
        omitted -- ln is libm-dependent and would break parity).

    Mergeable at scale: registers combine by max() -- the groupBy below IS
    the merge, and a 100 TB corpus reduces to 64 rows after one shuffle.
    """
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))), 1, 8), 16, 10
    ).cast("long")
    bucket = (h % HLL_M).alias("bucket")
    rest = F.floor(h / HLL_M).cast("long")
    bits = F.lpad(F.bin(rest), 26, "0")
    rho = F.when(rest == 0, F.lit(27)).otherwise(F.instr(bits, "1")).alias("rho")
    regs = (
        ev.select(bucket, rho)
        .groupBy("bucket")
        .agg(F.max("rho").alias("m"))
    )
    # PySpark's shiftleft wrapper wants an int literal; the SQL function
    # takes a column -- go through expr
    s_present = F.sum(F.lit(1.0) / F.expr("cast(shiftleft(1L, m) as double)"))
    agg = regs.agg(
        s_present.alias("s_present"), F.count(F.lit(1)).alias("n_present")
    ).select(
        (F.col("s_present") + (F.lit(HLL_M) - F.col("n_present")).cast("double")).alias("s"),
        (F.lit(HLL_M) - F.col("n_present")).cast("bigint").alias("empty_buckets"),
    )
    exact = ev.agg(F.count_distinct("user_id").cast("bigint").alias("exact_users"))
    return agg.crossJoin(exact).select(
        "exact_users",
        (F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) / F.col("s")).alias("hll_estimate"),
        "empty_buckets",
    )


BF_BITS = 4096  # filter size m
BF_WORD = 32  # bits per packed word (masks stay positive in a BIGINT)
BF_K = 4  # hash functions


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable BLOOM FILTER membership: build a 4096-bit filter
    over the viewer set, probe it with the purchaser set, and report
    observed false positives against the exact answer. Completes the
    portable-sketch family (KMV cardinality/set algebra, HLL) with the
    membership sketch -- and like them, every number is hash-exact in the
    oracle because the construction is md5 + integer bit ops only.

    Distributed shape: the filter is (word_index -> bit_or(mask)) -- ONE
    groupBy over k rows per element, and bit_or is the merge operator, so
    per-partition partial filters combine losslessly (exactly how you build
    a 100 TB-side bloom: mergeable partial aggregates, 128 result rows).
    The probe joins the tiny packed-word table broadcast; at scale this is
    the classic bloom-semi-join that prunes a shuffle side early.
    """
    ev = load_table(spark, sf_dir, "events")

    def positions(col):
        hs = []
        for i in range(BF_K):
            h = F.conv(
                F.substring(F.md5(F.concat(F.lit(f"bf{i}:"), col.cast("string"))), 1, 8), 16, 10
            ).cast("long")
            hs.append((h % BF_BITS).cast("int"))
        return F.array(*hs)

    # build over a PROPER SUBSET of users (every 3rd viewer) so the probe
    # set contains genuine non-members and the observed false-positive
    # count is a meaningful, nonzero-capable signal
    a = (
        ev.filter((F.col("event_type") == "view") & (F.col("user_id") % 3 == 0))
        .select("user_id")
        .distinct()
    )
    b = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    bloom = (
        a.select(F.explode(positions(F.col("user_id"))).alias("p"))
        .select(F.floor(F.col("p") / BF_WORD).cast("int").alias("word"), (F.col("p") % BF_WORD).alias("bit"))
        .select("word", F.expr(f"shiftleft(1L, bit)").alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("w"))
    )
    probe = (
        b.select("user_id", F.explode(positions(F.col("user_id"))).alias("p"))
        .select("user_id", F.floor(F.col("p") / BF_WORD).cast("int").alias("word"), (F.col("p") % BF_WORD).alias("bit"))
        .join(F.broadcast(bloom), "word", "left")
        .select("user_id", F.coalesce(F.expr("shiftright(w, bit) & 1"), F.lit(0)).alias("hit"))
        .groupBy("user_id")
        .agg(F.min("hit").alias("all_hit"))
    )
    flagged = probe.agg(
        F.count(F.lit(1)).alias("n_tested"),
        F.sum("all_hit").cast("bigint").alias("n_bloom_positive"),
    )
    true_members = b.join(a, "user_id", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true_members")
    )
    return flagged.crossJoin(true_members).select(
        "n_tested",
        "n_bloom_positive",
        "n_true_members",
        (F.col("n_bloom_positive") - F.col("n_true_members")).alias("n_false_positives"),
    )


def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) comparing the document-length
    distributions of src0 vs src1 -- the nonparametric two-sample test a
    corpus pipeline runs to detect distribution drift between sources
    without assuming normality. Emitted as the exact U statistic plus its
    null mean (n1*n2/2), so the consumer reads effect direction directly;
    the p-value needs only a normal lookup on the z-score.

    Portability: U is PURE RANK ARITHMETIC -- tied ranks are midranks
    (cum_less + (ties+1)/2, an exact dyadic rational), every sum fits a
    double exactly at any realistic n -- so the whole statistic is
    hash-exact cross-engine with no rounding anywhere.

    Plan: one groupBy on the value key compresses the sample to distinct
    values (the rank table), one window ordered by value forms cumulative
    counts, one scalar agg finishes -- the big side is touched once.
    """
    d = load_table(spark, sf_dir, "documents")
    two = d.filter(F.col("source").isin("src0", "src1"))
    by_val = two.groupBy("n_chars").agg(
        F.count(F.lit(1)).alias("c_all"),
        F.sum((F.col("source") == "src0").cast("bigint")).alias("c_a"),
    )
    # scale-safe cumulative count: the value grid is distinct n_chars --
    # bounded-ish but data-derived, so it rides the range-partitioned
    # global_cumsum, not a single-partition window
    from pgsf_spark.operators.ranking import global_cumsum

    ranked = global_cumsum(
        by_val, [F.col("n_chars").asc()], {"cum_less": (F.col("c_all"), False)}
    ).withColumn("avg_rank", F.col("cum_less") + (F.col("c_all") + 1) / 2.0)
    return ranked.agg(
        F.sum("c_a").cast("bigint").alias("n1"),
        (F.sum("c_all") - F.sum("c_a")).cast("bigint").alias("n2"),
        F.sum(F.col("c_a") * F.col("avg_rank")).alias("rank_sum_src0"),
    ).select(
        "n1",
        "n2",
        "rank_sum_src0",
        (
            F.col("rank_sum_src0") - (F.col("n1") * (F.col("n1") + 1)) / 2.0
        ).alias("u_statistic"),
        (F.col("n1") * F.col("n2") / 2.0).alias("u_null_mean"),
    )


def q_dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite (the Deequ/great-expectations shape,
    re-expressed as one declarative report): completeness, uniqueness,
    accepted-values, range, and referential-integrity checks over the
    orders/lineitem pair, emitted as a single row of violation counts a
    pipeline gate can assert on.

    Scale shape: every single-table constraint folds into ONE aggregate
    pass over orders (count/count_distinct/conditional sums share the
    scan -- Deequ's own design); the referential check is a left-anti
    count of lineitem order keys against orders, an equi-join Spark
    plans as broadcast or shuffled hash by size. Nothing quadratic, no
    second scan per constraint -- adding a constraint costs one more
    aggregate expression, not one more job."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    single = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).cast("bigint").alias("null_custkey"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).cast("bigint").alias("dup_orderkeys"),
        F.sum(F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0))
        .cast("bigint")
        .alias("bad_status"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).cast("bigint").alias("nonpos_price"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).cast("bigint").alias("null_orderdate"),
    )
    orphans = (
        li.select(F.col("l_orderkey").alias("k"))
        .join(o.select(F.col("o_orderkey").alias("k")), "k", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_lineitems"))
    )
    return single.crossJoin(orphans).select(
        "n_orders",
        "null_custkey",
        "dup_orderkeys",
        "bad_status",
        "nonpos_price",
        "null_orderdate",
        "orphan_lineitems",
        (
            (F.col("null_custkey") == 0)
            & (F.col("dup_orderkeys") == 0)
            & (F.col("bad_status") == 0)
            & (F.col("nonpos_price") == 0)
            & (F.col("null_orderdate") == 0)
            & (F.col("orphan_lineitems") == 0)
        ).alias("all_constraints_pass"),
    )


SKEW_TOP = 10


def q_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile for lineitem.l_partkey -- the pre-join
    diagnostic that decides between a plain shuffle join, AQE skew
    splitting, and explicit salting. Reports the key-frequency
    distribution (exact interpolated p50/p99, max) and how much of the
    fact table the SKEW_TOP heaviest keys own.

    Plan: one partial-agg shuffle keyed on l_partkey collapses the fact
    table to per-key counts; everything downstream (quantiles over |keys|
    rows, a top-N, two single-row aggregates broadcast together) is
    dimension-sized. The quantiles use the same exact interpolated
    percentile as q_order_quartiles -- swap in approx_percentile at 100 TB
    for one-pass profiling with the same output columns."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("freq"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("freq").alias("n_rows"),
        F.max("freq").alias("max_freq"),
        F.expr("percentile(freq, 0.5)").alias("p50_freq"),
        F.expr("percentile(freq, 0.99)").alias("p99_freq"),
    )
    top = (
        counts.orderBy(F.col("freq").desc(), "l_partkey")
        .limit(SKEW_TOP)
        .agg(F.sum("freq").alias("top_freq"))
    )
    return (
        stats.crossJoin(F.broadcast(top))
        .select(
            "n_keys",
            "n_rows",
            "max_freq",
            F.round("p50_freq", 4).alias("p50_freq"),
            F.round("p99_freq", 4).alias("p99_freq"),
            F.round(F.col("max_freq") / (F.col("n_rows") / F.col("n_keys")), 4).alias(
                "max_over_mean"
            ),
            F.round(F.col("top_freq") / F.col("n_rows"), 4).alias("top10_share"),
        )
    )


def q_referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit over the whole star schema: for every FK
    relationship, how many child rows reference a missing parent -- the
    first data-quality gate any warehouse load runs (the engine's replica
    tables have no FK enforcement, like every lake store, so integrity is
    checked, not declared).

    Each relationship is one LEFT ANTI join counting orphans; parent key
    sets are dimension-sized and broadcast (plan: zero shuffles for the
    dim-keyed checks; the lineitem->orders check joins two fact-scale key
    projections and AQE picks the strategy). The per-relationship counts
    union into one audit row each -- at 100 TB each check is a scan plus
    a broadcast probe, all independent and pipelined in one job."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")

    def check(name, child, fk, parent, pk):
        orphans = child.select(F.col(fk).alias("k")).join(
            parent.select(F.col(pk).alias("k")).distinct(), "k", "left_anti"
        )
        return child.agg(
            F.lit(name).alias("relationship"),
            F.count(F.lit(1)).alias("n_child_rows"),
        ).crossJoin(F.broadcast(orphans.agg(F.count(F.lit(1)).alias("n_orphans"))))

    checks = [
        check("orders.custkey->customer", o, "o_custkey", c, "c_custkey"),
        check("lineitem.orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
        check("lineitem.partkey->part", li, "l_partkey", p, "p_partkey"),
        check("lineitem.suppkey->supplier", li, "l_suppkey", s, "s_suppkey"),
        check("customer.nationkey->nation", c, "c_nationkey", n, "n_nationkey"),
        check("supplier.nationkey->nation", s, "s_nationkey", n, "n_nationkey"),
        check("nation.regionkey->region", n, "n_regionkey", r, "r_regionkey"),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out


ANOM_LAGS = 10  # truncated-EWMA forecast horizon (geometric 1/2^k weights)


def q_revenue_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-based anomaly detection on the daily revenue series: each
    day's forecast is a truncated-EWMA (the last ANOM_LAGS days, geometric
    1/2^k weights -- every weight a power of two, so the filter is
    bit-exact with no libm pow, same device as decayed_user_score);
    residuals beyond a 3-sigma-equivalent MAD fence are flagged. The
    control-chart pass a revenue/ops pipeline runs nightly.

    Plan: the daily rollup is one keyed shuffle of the fact table; the lag
    windows then run over the DAY series -- one row per day, bounded by
    the calendar, not data volume (same argument as the time-spine
    interpolation). Median/MAD are exact interpolated percentiles over
    that same day-sized relation."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(F.round(dsum(F.col("o_totalprice")), 4).alias("rev"))
    )
    w = Window.orderBy("day")
    norm = sum(1.0 / (1 << k) for k in range(ANOM_LAGS))  # 2 - 2^-(L-1), exact
    terms = [F.lag("rev", k + 1).over(w) / F.lit(float(1 << k)) for k in range(ANOM_LAGS)]
    forecast = sum(terms[1:], terms[0]) / F.lit(norm)
    scored = (
        daily.withColumn("rn", F.row_number().over(w))
        .withColumn("forecast", F.round(forecast, 4))
        .filter(F.col("rn") > ANOM_LAGS)  # full history only
        .withColumn("resid", F.round(F.col("rev") - F.col("forecast"), 4))
    )
    med = scored.agg(F.round(F.expr("percentile(resid, 0.5)"), 4).alias("med"))
    fence = scored.crossJoin(F.broadcast(med)).agg(
        F.first("med").alias("med"),
        F.round(F.expr("percentile(abs(resid - med), 0.5)"), 4).alias("mad"),
    )
    flagged = (
        scored.crossJoin(F.broadcast(fence))
        .filter(F.abs(F.col("resid") - F.col("med")) > 3 * 1.4826 * F.col("mad"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "rev",
            "forecast",
            "resid",
        )
    )
    return flagged.orderBy("day")


def q_wau_hll_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window MERGEABLE-SKETCH gate: per-day HLL registers of the
    active-user set, merged over each trailing 7-day window by max(), vs
    the exact WAU -- the plan that makes rolling distinct counts viable at
    100 TB (q_dau_wau_stickiness documents the exact form as its
    small-scale twin; THIS query is the scale form, hash-gated).

    The register table is |days| x 64 rows -- merging 7 days is a
    64-row max per window, independent of corpus size; the estimate uses
    the same exact power-of-two arithmetic as q_hll_portable (no ln, no
    decimal crutch needed). rel_err is emitted so the driver hash also
    pins the sketch's accuracy at this scale."""
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))), 1, 8), 16, 10
    ).cast("long")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    bucket = (h % HLL_M).alias("bucket")
    rest = F.floor(h / HLL_M).cast("long")
    bits = F.lpad(F.bin(rest), 26, "0")
    rho = F.when(rest == 0, F.lit(27)).otherwise(F.instr(bits, "1")).alias("rho")
    regs = ev.select(day, bucket, rho).groupBy("day", "bucket").agg(F.max("rho").alias("m"))
    spine = (
        ev.agg(
            F.date_trunc("day", F.min("ts")).alias("lo"),
            F.date_trunc("day", F.max("ts")).alias("hi"),
        )
        .select(F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d"))
    )
    merged = (
        spine.join(
            regs,
            (F.col("day") <= F.col("d")) & (F.col("day") >= F.col("d") - F.expr("interval 6 days")),
        )
        .groupBy("d", "bucket")
        .agg(F.max("m").alias("m"))
    )
    per_day = (
        merged.groupBy("d")
        .agg(
            F.sum(F.lit(1.0) / F.expr("cast(shiftleft(1L, m) as double)")).alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
        .select(
            "d",
            (F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M))
             / (F.col("s_present") + (F.lit(HLL_M) - F.col("n_present")).cast("double"))).alias("wau_estimate"),
        )
    )
    active = ev.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id").distinct()
    exact = (
        spine.join(
            active,
            (F.col("day") <= F.col("d")) & (F.col("day") >= F.col("d") - F.expr("interval 6 days")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("exact_wau"))
    )
    return per_day.join(exact, "d").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "exact_wau",
        "wau_estimate",
        F.round(F.abs(F.col("wau_estimate") - F.col("exact_wau")) / F.col("exact_wau"), 4).alias(
            "rel_err"
        ),
    )


def q_rolling_median_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day EXACT median of daily revenue (the robust twin of the
    EWMA forecast in q_revenue_anomaly_days): daily totals in integer
    cents, then percentile(0.5) over a RANGE frame keyed by the integer
    day index -- so a gap day shrinks the window population instead of
    silently widening the time span (ROWS frames get this wrong).

    Exactness: cents are integers, and both engines define even-count
    medians as the mean of the two middle values -- a half-integer,
    exactly representable in double. Scale: the heavy shuffle is the daily
    aggregation (keyed by day); the window then runs over ONE row per day
    -- a bounded series (3.7k rows per decade) on a single partition by
    design, the same shape as every calendar-spine query here."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents")
    )
    w = (
        Window.orderBy(F.datediff(F.col("day"), F.lit("1990-01-01")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "rev_cents",
        F.expr("percentile(rev_cents, 0.5D)").over(w).alias("med7_cents"),
        F.count(F.lit(1)).over(w).alias("days_in_window"),
    )


def q_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection on daily revenue (the sequential
    changepoint test; complements q_revenue_anomaly_days' outlier fence --
    CUSUM accumulates small persistent drift a pointwise fence misses).

    The recursive CUSUM S+_t = max(0, S+_{t-1} + x_t - mu - k*sigma) is
    rewritten to its closed form S_t - min(0, min_{s<=t} S_s) over the
    plain cumsum S of the SLACKED deviations -- two running windows
    instead of an inexpressible recursion, with the S_0 = 0 baseline
    included in the extremum (omitting it misses shifts that start on day
    one). Slack k = 0.5 sigma per step is what keeps the null series'
    random walk drifting back to zero instead of alarming everywhere
    (measured: without it 99% of TPC-H's flat revenue days 'alarm');
    threshold h = 5 sigma is the textbook pairing. Determinism: the
    cumsum is an ORDERED running fold of doubles (the conversion_hazard
    precedent), identical left-to-right in both engines, and it cannot
    overflow where an integer-cents accumulation would. The day-grain
    windows ride a bounded single-partition series; the daily rollup
    underneath is the only data-sized shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("total"),
        F.sum(F.col("rev").cast("decimal(38,0)") * F.col("rev")).alias("sumsq"),
    )
    mu = F.col("total").cast("double") / F.col("n")
    sigma = F.sqrt(F.col("sumsq").cast("double") / F.col("n") - mu * mu)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    scaled = (
        daily.crossJoin(stats)
        # slacked deviations, one per direction (up drifts need x - mu - k*s,
        # down drifts x - mu + k*s); ordered folds keep them deterministic
        .withColumn("du", F.col("rev").cast("double") - mu - F.lit(0.5) * sigma)
        .withColumn("dd", F.col("rev").cast("double") - mu + F.lit(0.5) * sigma)
        .withColumn("su", F.sum("du").over(w))
        .withColumn("sd", F.sum("dd").over(w))
        .withColumn("min_su", F.least(F.min("su").over(w), F.lit(0.0)))
        .withColumn("max_sd", F.greatest(F.max("sd").over(w), F.lit(0.0)))
    )
    thresh = F.lit(5.0) * sigma
    flagged = (
        scaled.withColumn("up_drift", F.col("su") - F.col("min_su"))
        .withColumn("down_drift", F.col("max_sd") - F.col("sd"))
        .withColumn("up_flag", F.col("up_drift") > thresh)
        .withColumn("down_flag", F.col("down_drift") > thresh)
    )
    # the detector's OUTPUT is the alarm summary: when each direction first
    # crossed, how far the drift ran, how much of the series is in alarm
    return flagged.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min(F.when(F.col("up_flag"), F.date_format("day", "yyyy-MM-dd"))).alias(
            "first_up_alarm"
        ),
        F.min(F.when(F.col("down_flag"), F.date_format("day", "yyyy-MM-dd"))).alias(
            "first_down_alarm"
        ),
        F.sum(F.when(F.col("up_flag") | F.col("down_flag"), 1).otherwise(0)).alias(
            "n_alarm_days"
        ),
        F.round(F.max(F.col("up_drift")) / 100.0, 2).alias("max_up_drift_usd"),
        F.round(F.max(F.col("down_drift")) / 100.0, 2).alias("max_down_drift_usd"),
    )


PSI_BINS = 10


def q_feature_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of order value, first half of history
    (reference) vs second half (current) -- the standard production drift
    score (>0.2 = retrain). Decile edges come from the REFERENCE period's
    exact interpolated percentiles over integer cents, so binning is
    engine-exact; per-bin contributions (p_cur - p_ref) * ln(p_cur/p_ref)
    use one ln per bin (the dsir_weights parity precedent) and round to
    6dp.

    Plan: one pass computes the split date (median order date) and the
    reference percentiles (both tiny scalars/arrays, broadcast as
    literals-by-join); binning is a projection; the aggregate is keyed by
    10 bins. Zero-count bins get the standard 1e-6 floor on both faces so
    ln never sees zero."""
    o = load_table(spark, sf_dir, "orders")
    vals = o.select(
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("dayi"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # bounded materializations (1-row split date / 1-row edge vector /
    # 10-row bin counts): each is referenced by multiple downstream passes
    # and would otherwise re-run its whole upstream pass per reference
    split = vals.agg(F.expr("percentile(dayi, 0.5D)").alias("mid")).localCheckpoint(
        eager=True
    )
    tagged = vals.crossJoin(split).select(
        "cents", (F.col("dayi") <= F.col("mid")).alias("is_ref")
    )
    edges = (
        tagged.filter("is_ref")
        .agg(
            *[
                F.expr(f"percentile(cents, {k / PSI_BINS}D)").alias(f"e{k}")
                for k in range(1, PSI_BINS)
            ]
        )
        .localCheckpoint(eager=True)
    )
    bin_expr = F.lit(1)
    for k in range(1, PSI_BINS):
        bin_expr = bin_expr + (F.col("cents") > F.col(f"e{k}")).cast("int")
    counts = (
        tagged.crossJoin(edges)
        .select(bin_expr.alias("bin"), "is_ref")
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(~F.col("is_ref"), 1).otherwise(0)).alias("n_cur"),
        )
        .localCheckpoint(eager=True)
    )
    tot = counts.agg(
        F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc")
    )
    scored = counts.crossJoin(tot).select(
        "bin",
        "n_ref",
        "n_cur",
        F.greatest(F.col("n_ref") / F.col("tr"), F.lit(1e-6)).alias("p_ref"),
        F.greatest(F.col("n_cur") / F.col("tc"), F.lit(1e-6)).alias("p_cur"),
    )
    contrib = (F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref"))
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return scored.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("p_cur", 6).alias("p_cur"),
        F.round(contrib, 6).alias("psi_contrib"),
        F.round(F.sum(F.round(contrib, 6)).over(w), 6).alias("psi_total"),
    ).orderBy("bin")


def q_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend concentration (the inequality
    number behind 'top 1% of customers drive X%' and behind source-
    weighting decisions in corpus curation): G = 2*sum(i*x_i)/(n*sum(x))
    - (n+1)/n over spend-sorted customers, exact in decimal cents.

    The global rank comes from operators.ranking.global_rank (range
    partition + per-partition offsets, the training_shard_order pattern
    promoted to a shared operator) -- NO single-partition window, so the
    customer grain scales. Deterministic tiebreak (spend, custkey) pins
    the hash; the i*x products go through decimal so the sum is exact at
    any n."""
    from pgsf_spark.operators.ranking import global_rank

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    ranked = global_rank(spend, [F.col("cents").asc(), F.col("o_custkey").asc()], "i")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("total_cents"),
        F.round(
            F.lit(2.0)
            * F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents")).cast("double")
            / (F.count(F.lit(1)) * F.sum(F.col("cents").cast("decimal(38,0)")).cast("double"))
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


# Benford expected first-digit probabilities as Python-computed literals --
# no runtime log on either face
import math as _math

BENFORD_P = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals (the
    classic fabricated-data / unit-mix-up detector in financial DQ): digit
    counts vs expected log10(1+1/d) (embedded as literals, so no runtime
    log), chi-square accumulated in DECIMAL per digit so the statistic is
    order-exact. First digit comes from the integer-cents string (x100
    shifts the decimal point, never the leading digit)."""
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1)
    counts = o.select(digit.cast("int").alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("total"))
    exp_expr = F.create_map(
        *[x for d, p in BENFORD_P.items() for x in (F.lit(d), F.lit(p))]
    )
    scored = counts.crossJoin(tot).select(
        "digit",
        "n",
        (F.element_at(exp_expr, F.col("digit")) * F.col("total")).alias("expected"),
    )
    chi = (
        ((F.col("n") - F.col("expected")) * (F.col("n") - F.col("expected")))
        / F.col("expected")
    ).cast("decimal(27,10)")
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return scored.select(
        "digit",
        "n",
        F.round("expected", 2).alias("expected"),
        F.round(F.sum(chi).over(w).cast("double"), 6).alias("chi_square"),
    ).orderBy("digit")


def q_ks_test_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between first-half and
    second-half order values (the distribution-shape drift test next to
    Mann-Whitney's rank shift and PSI's binned score): D = max |F1 - F2|
    over the pooled sorted sample, computed EXACTLY in integers -- at each
    pooled point, |c1*n2 - c2*n1| compares ECDFs over the common
    denominator n1*n2, so the maximum needs no floating point at all;
    the reported D divides once at the end.

    One sort-shuffle of (value, side) rows with two running counts -- the
    same shape as the Mann-Whitney midranks; ties are handled by taking
    the ECDF values AFTER all rows of a tied value (max over groups of the
    last row per value, standard KS tie treatment)."""
    o = load_table(spark, sf_dir, "orders")
    vals = o.crossJoin(
        o.agg(F.expr("percentile(datediff(to_date(o_orderdate), '1970-01-01'), 0.5D)").alias("mid"))
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        (F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")) <= F.col("mid")).alias(
            "s1"
        ),
    )
    # per distinct value: cumulative counts AFTER the value (last row of the
    # tie group) -- groupBy value first so the cumsum rides distinct values;
    # the grid is data-derived (distinct cents), so the running counts come
    # from the range-partitioned global_cumsum, not a one-partition window
    from pgsf_spark.operators.ranking import global_cumsum

    per_v = vals.groupBy("v").agg(
        F.sum(F.col("s1").cast("long")).alias("d1"),
        F.sum((~F.col("s1")).cast("long")).alias("d2"),
    )
    cum = global_cumsum(
        per_v,
        [F.col("v").asc()],
        {"c1": (F.col("d1"), True), "c2": (F.col("d2"), True)},
    ).select("v", "c1", "c2")
    n = vals.agg(
        F.sum(F.col("s1").cast("long")).alias("n1"),
        F.sum((~F.col("s1")).cast("long")).alias("n2"),
    )
    scored = cum.crossJoin(n).select(
        (F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))).alias("num"),
        "n1",
        "n2",
    )
    return scored.groupBy("n1", "n2").agg(
        F.max("num").alias("max_num")
    ).select(
        "n1",
        "n2",
        F.round(F.col("max_num") / (F.col("n1") * F.col("n2")), 6).alias("ks_d"),
    )


def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on daily revenue (the
    nonparametric is-it-drifting-up question, completing the time-series
    shelf next to CUSUM's when-did-it-shift): S = sum of sign(x_j - x_i)
    over ordered day pairs, EXACT in integers, with the tie-corrected
    variance 18*Var(S) = n(n-1)(2n+5) - sum t(t-1)(2t+5) and the
    continuity-corrected z.

    The pairwise comparison is a deliberate BroadcastNestedLoopJoin over
    the DAY-GRAIN series (2.4k rows -> ~3M cheap comparisons; the same
    bounded-calendar argument every spine query here makes) -- the
    data-sized work is only the daily rollup."""
    orders = load_table(spark, sf_dir, "orders")
    # materialize the calendar-bounded day-grain rollup ONCE: it feeds four
    # consumers (both BNL join sides, the tie histogram, the n scalar), and
    # each reference re-ran the full orders scan + aggregate -- 4 fact
    # passes for one ~2.4k-row table (OPTIMIZATION_r14, guide §2.4/§5)
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    ).localCheckpoint(eager=True)
    a = daily.select(F.col("day").alias("d1"), F.col("rev").alias("x1"))
    b = daily.select(F.col("day").alias("d2"), F.col("rev").alias("x2"))
    s_agg = (
        a.join(b, F.col("d1") < F.col("d2"))
        .agg(F.sum(F.signum(F.col("x2") - F.col("x1")).cast("long")).alias("s"))
    )
    ties = daily.groupBy("rev").agg(F.count(F.lit(1)).alias("t")).filter(F.col("t") > 1)
    tie_term = ties.agg(
        F.coalesce(
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
        ).alias("tt")
    )
    n_agg = daily.agg(F.count(F.lit(1)).alias("n"))
    j = s_agg.crossJoin(n_agg).crossJoin(tie_term)
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tt")
    ).cast("double")
    z = F.when(
        F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var18 / 18.0)
    ).when(
        F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var18 / 18.0)
    ).otherwise(F.lit(0.0))
    return j.select(
        "n",
        "s",
        F.round(z, 4).alias("z"),
        (F.abs(z) > 1.96).alias("significant_5pct"),
    )


def q_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend slope of daily revenue: the median of all
    pairwise slopes (x_j - x_i) / (days between), the estimator that pairs
    with Mann-Kendall (MK says WHETHER the trend is real, Theil-Sen says
    HOW STEEP, both immune to outlier days that wreck OLS).

    Same bounded day-grain pairwise shape as q_mann_kendall_trend
    (broadcast nested-loop over the calendar rollup); each slope is one
    double division (identical IEEE op in both engines) and the exact
    interpolated median over the pair set is engine-portable."""
    orders = load_table(spark, sf_dir, "orders")
    # day-grain rollup materialized once (both BNL join sides read it; the
    # second reference re-ran the full orders scan + aggregate -- guide §2.4)
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    ).localCheckpoint(eager=True)
    a = daily.select(F.col("day").alias("d1"), F.col("rev").alias("x1"))
    b = daily.select(F.col("day").alias("d2"), F.col("rev").alias("x2"))
    slopes = a.join(b, F.col("d1") < F.col("d2")).select(
        (
            (F.col("x2") - F.col("x1")).cast("double")
            / F.datediff(F.col("d2"), F.col("d1")).cast("double")
        ).alias("slope")
    )
    return slopes.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.expr("percentile(slope, 0.5D)") / 100.0, 6).alias("slope_usd_per_day"),
        F.round(F.expr("percentile(slope, 0.5D)") * 365.0 / 100.0, 2).alias(
            "slope_usd_per_year"
        ),
    )


ACF_MAX_LAG = 7  # weekly seasonality window for a daily series


def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily revenue series at lags 1..7 --
    the seasonality diagnostic that pairs with the trend tests (Mann-Kendall
    / Theil-Sen say trend, ACF says PERIOD: a weekly cycle shows as a spike
    at lag 7). r_k = sum((x_t - mean)(x_{t-k} - mean)) / sum((x_t - mean)^2)
    over the observed-day sequence.

    Portability: the mean subtraction is cleared of division entirely --
    with y_t = n*x_t - s (exact BIGINT), every n^2 factor cancels in the
    ratio, so r_k = sum(y_t * y_{t-k}) / sum(y_t^2) with EXACT integer
    products accumulated in DECIMAL(38,0): no float enters until the single
    final division, which is one identical IEEE op in both engines. Plan:
    the rollup is one keyed shuffle of orders; everything after runs on the
    day-grain series (calendar-bounded: ~2.4k rows at ANY corpus scale),
    where one window sort feeds all 7 lag columns."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice")).cast("long")).alias("rev")
    )
    stats = daily.agg(F.sum("rev").alias("s"), F.count(F.lit(1)).alias("n"))
    y = daily.crossJoin(F.broadcast(stats)).select(
        "day", (F.col("n") * F.col("rev") - F.col("s")).alias("y")
    )
    w = Window.orderBy("day")
    dec = "decimal(19,0)"
    lagged = y.select(
        "y",
        *[F.lag("y", k).over(w).alias(f"y{k}") for k in range(1, ACF_MAX_LAG + 1)],
    )
    terms = lagged.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        (F.col("y").cast(dec) * F.col(f"y{k}").cast(dec)).alias("yy"),
                    )
                    for k in range(1, ACF_MAX_LAG + 1)
                ]
            )
        ).alias("t"),
    )
    den = y.agg(
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("den")
    )
    return (
        terms.filter(F.col("t.yy").isNotNull())
        .groupBy(F.col("t.lag").alias("lag"))
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(F.col("t.yy")).alias("num"),
        )
        .crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_terms",
            F.round(
                F.col("num").cast("double") / F.col("den").cast("double"), 6
            ).alias("acf"),
        )
        .orderBy("lag")
    )


def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-seasonality strength of daily revenue: one-way ANOVA by
    day-of-week. eta^2 = SS_between / SS_total says what fraction of daily
    variance the weekday explains (the decomposition counterpart to
    q_acf_daily_revenue's lag-7 spike); the F statistic is the significance
    face of the same sums.

    Portability: every sum of squares reduces to INTEGER sufficient
    statistics -- n, s = sum(y), ssq = sum(y^2), and per-weekday (n_d, s_d)
    -- via SS_within = ssq - sum_d(s_d^2/n_d), SS_total = ssq - s^2/n. The
    integer sums accumulate exactly (y^2 in DECIMAL(38,0)); each group's
    s_d^2/n_d is ONE double division rounded to 4 digits before the final
    7-term decimal sum, so no accumulation order anywhere. Plan: the daily
    rollup is one keyed shuffle; the weekday aggregate runs on the
    calendar-bounded day series."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice")).cast("long")).alias("y")
    )
    dec = "decimal(38,0)"
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("ssq"),
    )
    # dayofweek() is locale-independent in Spark (1=Sunday); the oracle uses
    # its own weekday function mapped to the same numbering
    per_dow = daily.groupBy(F.dayofweek("day").alias("dow")).agg(
        F.count(F.lit(1)).alias("n_d"), F.sum("y").alias("s_d")
    )
    grp = per_dow.select(
        F.round(
            (F.col("s_d").cast(dec) * F.col("s_d").cast(dec)).cast("double")
            / F.col("n_d"),
            4,
        ).cast("decimal(38,6)").alias("t")
    ).agg(F.sum("t").cast("double").alias("between_raw"), F.count(F.lit(1)).alias("k"))
    j = grp.crossJoin(F.broadcast(tot))
    ss_total = F.col("ssq").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ss_within = F.col("ssq").cast("double") - F.col("between_raw")
    ss_between = F.col("between_raw") - F.col("s").cast("double") * F.col("s") / F.col("n")
    return j.select(
        F.col("n").alias("n_days"),
        F.col("k").alias("k_groups"),
        F.round(ss_between / ss_total, 6).alias("eta_sq"),
        F.round(
            (ss_between / (F.col("k") - 1)) / (ss_within / (F.col("n") - F.col("k"))), 4
        ).alias("f_stat"),
    )


def q_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-Wasserstein (earth mover's) distance between the document-length
    distributions of src0 and src1 -- the drift metric that complements the
    shelf's KS test (KS = sup |F1-F2| reacts to the worst point; W1 =
    integral |F1-F2| measures how much mass must MOVE, in n_chars units).

    Exactness: for 1-D empirical CDFs, W1 = sum over the merged value grid
    of |F1(v) - F2(v)| * (v_next - v). Clearing denominators, |F1 - F2| =
    |c1*n2 - c2*n1| / (n1*n2) with INTEGER cumulative counts, so the whole
    integral is one BIGINT sum divided once at the end -- no float until
    the final division. Plan: one groupBy on the value key compresses both
    samples to the distinct-value grid (same shape as q_mann_whitney_u /
    q_ks_test_gate), one window forms the cumulative counts and the grid
    step, one scalar agg finishes."""
    d = load_table(spark, sf_dir, "documents")
    two = d.filter(F.col("source").isin("src0", "src1"))
    by_val = two.groupBy(F.col("n_chars").alias("v")).agg(
        F.sum((F.col("source") == "src0").cast("bigint")).alias("d1"),
        F.sum((F.col("source") == "src1").cast("bigint")).alias("d2"),
    )
    # running counts + grid step over the data-derived value grid: one
    # range-partitioned pass (global_order_stats handles the lead's
    # cross-partition seam), no single-partition window
    from pgsf_spark.operators.ranking import global_order_stats

    cum = (
        global_order_stats(
            by_val,
            [F.col("v").asc()],
            cumsums={"c1": (F.col("d1"), True), "c2": (F.col("d2"), True)},
            lead_col=("v", "__nxt"),
        )
        .select("v", "c1", "c2", (F.col("__nxt") - F.col("v")).alias("dv"))
        .filter(F.col("dv").isNotNull())
    )
    tot = by_val.agg(F.sum("d1").alias("n1"), F.sum("d2").alias("n2"))
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
            F.sum(
                F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
                * F.col("dv")
            ).alias("num"),
        )
        .select(
            "n1",
            "n2",
            F.round(F.col("num") / (F.col("n1") * F.col("n2")), 6).alias("w1_chars"),
        )
    )


HUBER_ROUNDS = 3
HUBER_C = 1.4826  # MAD -> sigma-equivalent scale


def q_huber_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Huber robust mean of document length via HUBER_ROUNDS
    IRLS rounds -- the location estimate that (unlike the mean) ignores a
    crawl's pathological outlier docs but (unlike the median) keeps
    sqrt(n)-efficiency on the clean mass. Weights: w = min(1, k/|y - m|)
    with k = max(1, HUBER_C * MAD) (floored at one character so a
    degenerate half-constant source cannot zero the scale).

    Portability: y is integer; each round's m is rounded to 6 digits and
    each weight to 9 BEFORE the decimal-exact weighted sums, so the IRLS
    trajectory is reproducible term-for-term in the unrolled oracle (the
    kmeans/IPF device). Plan: the initial median/MAD and each round are
    one groupBy(source) pass over the corpus -- HUBER_ROUNDS+1 scans total,
    each a keyed partial-agg shuffle, no windows over doc-grain data."""
    d = load_table(spark, sf_dir, "documents")
    y = d.select("source", F.col("n_chars").cast("double").alias("y"))
    m0 = y.groupBy("source").agg(
        F.expr("percentile(y, 0.5D)").alias("med"), F.count(F.lit(1)).alias("n")
    )
    scale = (
        y.join(F.broadcast(m0), "source")
        .groupBy("source")
        .agg(F.expr("percentile(abs(y - med), 0.5D)").alias("mad"))
        .select(
            "source",
            F.round(F.greatest(F.lit(HUBER_C) * F.col("mad"), F.lit(1.0)), 6).alias("k"),
        )
    )
    m = m0.select("source", F.round("med", 6).alias("m")).join(scale, "source")
    for _ in range(HUBER_ROUNDS):
        terms = y.join(F.broadcast(m), "source").select(
            "source",
            "y",
            "k",
            F.round(
                F.when(F.abs(F.col("y") - F.col("m")) <= F.col("k"), F.lit(1.0)).otherwise(
                    F.col("k") / F.abs(F.col("y") - F.col("m"))
                ),
                9,
            ).alias("w"),
        )
        m = (
            terms.groupBy("source", "k")
            .agg(
                F.round(
                    F.sum((F.col("w") * F.col("y")).cast("decimal(38,9)")).cast("double")
                    / F.sum(F.col("w").cast("decimal(38,9)")).cast("double"),
                    6,
                ).alias("m")
            )
            .select("source", "m", "k")
        )
    mean = y.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum(F.col("y").cast("decimal(27,4)")).cast("double") / F.count(F.lit(1)), 4).alias("mean_chars"),
    )
    return (
        mean.join(m, "source")
        .select(
            "source",
            "n_docs",
            "mean_chars",
            F.round("m", 4).alias("huber_mean"),
            F.col("k").alias("k_scale"),
        )
        .orderBy("source")
    )


def q_spearman_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between calendar position and daily
    revenue -- the rank-based trend strength that completes the monotone
    shelf (Mann-Kendall answers IS there a trend, Theil-Sen how steep in
    dollars, Spearman how CONSISTENTLY monotone on a -1..1 scale).

    Exactness: ranks are made integer-exact by doubling -- for revenue
    ties, positions c+1..c+t average to c+(t+1)/2, so 2*avg = 2*rank()+
    count(*) OVER tie-partition - 1, an INTEGER; the day rank is just
    2*row_number(). Pearson over the doubled ranks (scale cancels) is
    assembled from DECIMAL(38,0) moments, one float division at the end
    (the q_price_quantity_corr device applied to ranks). Plan: one orders
    rollup shuffle to day grain, then rank windows over the ~2.4k-row
    day spine (single-partition by design, like every stat on this shelf)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    wd = Window.orderBy("day")
    wr = Window.orderBy("rev")
    ranked = daily.select(
        (2 * F.row_number().over(wd)).alias("u"),
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(Window.partitionBy("rev")) - 1).alias(
            "v"
        ),
    )

    def s(col_expr):
        return F.sum(col_expr.cast("decimal(38,0)")).cast("double")

    u, v = F.col("u"), F.col("v")
    n = F.count(F.lit(1)).cast("double")
    num = n * s(u * v) - s(u) * s(v)
    den = F.sqrt(n * s(u * u) - s(u) * s(u)) * F.sqrt(n * s(v * v) - s(v) * s(v))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_days"),
        # try_divide: a constant-revenue or single-day series makes den
        # exactly 0; DuckDB's / yields NULL there while a plain Spark /
        # yields NaN -- NULL on both faces keeps the degenerate case green
        F.round(F.try_divide(num, den), 6).alias("spearman_rho"),
    )


def q_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between market segment and nation
    over the customer table -- the categorical-association gate next to the
    numeric shelf (is the segment mix actually uniform across geographies,
    or is a sampler/filter skewing it?). Includes Cramer's V so the effect
    size is scale-free.

    Exactness: observed counts and both margins are integers; each cell's
    expected count e = row_tot*col_tot/N and contribution (o-e)^2/e are
    computed with the same IEEE double ops on both engines, rounded to 6
    at the CELL grain, then summed in DECIMAL(38,6) so accumulation order
    cannot drift the total. Zero-observed cells with positive margins
    contribute e -- the margin grid is built by a broadcast
    segments x nations cross (5 x 25 rows, the bounded-dims cross the
    mann_kendall day spine already established). Plan: one customer
    groupBy shuffle; everything after runs on <= 125 rows."""
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    rows_ = cells.groupBy("c_mktsegment").agg(F.sum("o").alias("rt"))
    cols_ = cells.groupBy("c_nationkey").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("n"))
    grid = rows_.crossJoin(F.broadcast(cols_)).crossJoin(F.broadcast(tot))
    full = grid.join(cells, ["c_mktsegment", "c_nationkey"], "left").select(
        "c_mktsegment",
        "c_nationkey",
        "rt",
        "ct",
        "n",
        F.coalesce(F.col("o"), F.lit(0)).alias("o"),
    )
    e = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("n").cast("double")
    contrib = F.round((F.col("o") - e) * (F.col("o") - e) / e, 6)
    agg = full.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.countDistinct("c_mktsegment").cast("bigint").alias("n_segments"),
        F.countDistinct("c_nationkey").cast("bigint").alias("n_nations"),
        F.round(F.sum(contrib.cast("decimal(38,6)")).cast("double"), 6).alias("chi_square"),
    )
    dof = (F.col("n_segments") - 1) * (F.col("n_nations") - 1)
    v_den = F.col("n_customers").cast("double") * F.least(
        F.col("n_segments") - 1, F.col("n_nations") - 1
    ).cast("double")
    return agg.select(
        "n_customers",
        "n_segments",
        "n_nations",
        dof.cast("bigint").alias("dof"),
        "chi_square",
        F.round(F.sqrt(F.col("chi_square") / v_den), 6).alias("cramers_v"),
    )


STL_HALF = 3  # centered 7-day trend window


def q_stl_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite additive decomposition of daily revenue: trend = centered
    7-day moving average, seasonal = per-day-of-week mean of the detrended
    series, residual = the rest. Reports the seasonal profile (the
    actionable output: HOW MUCH each weekday deviates) plus the variance
    split -- the decomposition counterpart of q_seasonality_strength's
    hypothesis test.

    Determinism: the trend mean divides a DECIMAL(38,0) window sum by the
    window count (edges use the available window, like the classic
    centered-MA convention) and rounds to 6; detrended values round to 6
    and accumulate as DECIMAL(38,6) into the per-dow means and variance
    moments, so no float order dependence anywhere. Plan: one orders
    rollup shuffle, windows over the ~2.4k-row day spine, then a 7-row
    dow aggregate with the variance split window-totaled over it."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    w = Window.orderBy("day").rowsBetween(-STL_HALF, STL_HALF)
    dt = daily.select(
        "day",
        "rev",
        F.round(
            F.sum(F.col("rev").cast("decimal(38,0)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("trend"),
    ).select(
        F.dayofweek("day").alias("dow"),
        F.round(F.col("rev") - F.col("trend"), 6).cast("decimal(38,6)").alias("d"),
    )
    per_dow = dt.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.sum("d").cast("double") / F.count(F.lit(1)), 6).alias("seasonal_cents"),
        F.sum("d").alias("sd"),
        F.sum((F.col("d") * F.col("d")).cast("decimal(38,12)")).alias("sdd"),
    )
    tot = Window.partitionBy()
    n_t = F.sum("n_days").over(tot).cast("double")
    sd_t = F.sum("sd").over(tot).cast("double")
    sdd_t = F.sum("sdd").over(tot).cast("double")
    # total variance of detrended; between-dow (seasonal) share of it
    var_tot = sdd_t / n_t - (sd_t / n_t) * (sd_t / n_t)
    between = F.sum(
        F.round(
            (F.col("sd").cast("double") / F.col("n_days"))
            * (F.col("sd").cast("double") / F.col("n_days"))
            * F.col("n_days"),
            6,
        ).cast("decimal(38,6)")
    ).over(tot).cast("double") / n_t
    return per_dow.select(
        "dow",
        "n_days",
        "seasonal_cents",
        # try_divide: var_tot is exactly 0 for a constant detrended series;
        # NULL on both faces (DuckDB / yields NULL) beats Spark's NaN
        F.round(F.try_divide(between, var_tot), 6).alias("seasonal_share"),
    ).orderBy("dow")


MEDIAN_B = 1024  # histogram buckets per refinement round
MEDIAN_ROUNDS = 3  # 1024^3 > any cents range: guarantees exact convergence


def q_exact_median_refinement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median of order value by iterative histogram
    refinement -- the scale device for exact order statistics at 100 TB,
    where a global sort (or a single-partition rank window) is off the
    table. Each round histograms the surviving value range into MEDIAN_B
    integer buckets, locates the bucket containing the k-th element from
    the 1024-row cumulative count, and recurses into it; after
    MEDIAN_ROUNDS rounds the surviving range is narrower than
    range/1024^3 < 1 cent, so a final tiny groupBy names the element.
    MEDIAN_ROUNDS+1 scans replace the sort; every step is integer-exact.

    The answer is the lower median (k = (n+1) div 2), a uniquely-defined
    order statistic the oracle can state independently as the k-th
    smallest -- no need to mirror the refinement. Per-round state is a
    1-row DataFrame (lo, hi, k) broadcast into the next scan, check-
    pointed so the unrolled rounds cannot replay the chain (the house
    PCA/kmeans lesson)."""
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v")
    ).localCheckpoint(eager=True)
    return _lower_median_refined(vals).select(
        F.col("n").alias("n_orders"),
        F.col("v").alias("median_cents"),
        F.round(F.col("v") / 100.0, 2).alias("median_usd"),
    )


def _lower_median_refined(vals: DataFrame) -> DataFrame:
    """1-row (n, v): the LOWER MEDIAN (k = (n+1) div 2 smallest) of the
    long column ``v`` by histogram refinement -- the shared core of
    q_exact_median_refinement and q_mad_robust_scale.  ``vals`` must be
    checkpointed by the caller (each round re-scans it)."""
    state = vals.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.expr("(count(1) + 1) div 2").alias("k"),
        F.count(F.lit(1)).alias("n"),
    ).localCheckpoint(eager=True)
    for _ in range(MEDIAN_ROUNDS):
        j = vals.crossJoin(F.broadcast(state)).filter(
            (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        )
        hist = (
            j.select(
                F.expr(f"(v - lo) div (((hi - lo) div {MEDIAN_B}) + 1)").alias("b"),
                "lo",
                "hi",
                "k",
                "n",
            )
            .groupBy("b", "lo", "hi", "k", "n")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        cum = hist.select(
            "*",
            F.sum("c").over(Window.partitionBy("lo").orderBy("b")).alias("cum"),
        )
        state = (
            cum.filter(F.col("cum") >= F.col("k"))
            .orderBy("b")
            .limit(1)
            .select(
                (F.col("lo") + F.col("b") * F.expr(f"((hi - lo) div {MEDIAN_B}) + 1")).alias(
                    "lo2"
                ),
                F.least(
                    F.col("hi"),
                    F.col("lo")
                    + (F.col("b") + 1) * F.expr(f"((hi - lo) div {MEDIAN_B}) + 1")
                    - 1,
                ).alias("hi2"),
                (F.col("k") - (F.col("cum") - F.col("c"))).alias("k2"),
                "n",
            )
            .withColumnsRenamed({"lo2": "lo", "hi2": "hi", "k2": "k"})
            .localCheckpoint(eager=True)
        )
    fin = (
        vals.crossJoin(F.broadcast(state))
        .filter((F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
        .groupBy("v", "k", "n")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = fin.select("*", F.sum("c").over(Window.partitionBy("n").orderBy("v")).alias("cum"))
    return cum.filter(F.col("cum") >= F.col("k")).orderBy("v").limit(1).select("n", "v")


MAD_SIGMA = 1.4826  # normal-consistency factor: sigma_hat = MAD_SIGMA * MAD


def q_mad_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median Absolute Deviation of order value -- the robust scale
    estimate (50% breakdown point; one corrupted feed cannot move it)
    every outlier gate on this shelf should be normalized by instead of
    the stddev it currently trusts: sigma_hat = 1.4826 * MAD under
    normality.  Computed EXACTLY at 100 TB by running the histogram-
    refinement k-th-element device TWICE (median of v, then lower median
    of |v - median|) -- 2*(MEDIAN_ROUNDS+1) scans replace two global
    sorts; every step is integer-exact.

    Exactness: both medians are uniquely-defined integer order statistics
    (stated independently by the oracle as k-th smallest); the only
    doubles are the two final /100 renders and the literal consistency
    product."""
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v")
    ).localCheckpoint(eager=True)
    med = _lower_median_refined(vals)
    dev = (
        vals.crossJoin(F.broadcast(med.select(F.col("v").alias("m"))))
        .select(F.abs(F.col("v") - F.col("m")).alias("v"))
        .localCheckpoint(eager=True)
    )
    mad = _lower_median_refined(dev)
    return (
        med.select(F.col("n").alias("n_orders"), F.col("v").alias("median_cents"))
        .crossJoin(F.broadcast(mad.select(F.col("v").alias("mad_cents"))))
        .select(
            "n_orders",
            F.round(F.col("median_cents") / 100.0, 2).alias("median_usd"),
            F.round(F.col("mad_cents") / 100.0, 2).alias("mad_usd"),
            F.round(F.lit(MAD_SIGMA) * F.col("mad_cents") / 100.0, 4).alias(
                "robust_sigma_usd"
            ),
        )
    )


def q_nation_revenue_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS of order value against calendar time -- grouped
    regression, the per-segment trend readout (which geographies are
    growing and how fast) next to the global trend tests. slope =
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) with x = days since epoch and y =
    order cents; r^2 is the squared Pearson correlation.

    Exactness: all five moments accumulate as DECIMAL(38,0) over exact
    integers (x ~ 1e4, y ~ 1e7: products fit with 20+ digits to spare),
    cast to double once, then the same closed-form IEEE arithmetic on
    both engines. Plan: orders joins broadcast customer->nation keys, one
    groupBy(nation) shuffle carrying five sums -- the canonical
    map-side-combine regression at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        orders.select(
            "o_custkey",
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")).alias("x"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
        )
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
    )

    def s(col_expr):
        return F.sum(col_expr.cast("decimal(38,0)")).cast("double")

    x, y = F.col("x"), F.col("y")
    n = F.count(F.lit(1)).cast("double")
    num = n * s(x * y) - s(x) * s(y)
    den_x = n * s(x * x) - s(x) * s(x)
    den_y = n * s(y * y) - s(y) * s(y)
    # try_divide throughout: a degenerate group (all orders on one date ->
    # den_x = 0; all prices equal -> den_y = 0) must yield NULL on both
    # faces (DuckDB's x/0 is NULL; plain Spark double division is Inf/NaN)
    slope = F.try_divide(num, den_x)
    corr = F.try_divide(num, F.sqrt(den_x))
    return (
        base.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(slope / 100.0, 6).alias("slope_usd_per_day"),
            F.round((s(y) - slope * s(x)) / n / 100.0, 4).alias("intercept_usd"),
            F.round(F.try_divide(corr * corr, den_y), 6).alias("r_sq"),
        )
        .orderBy("n_name")
    )


def q_binary_segmentation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoint: the single split of the daily
    revenue series that maximizes between-segment sum of squares -- the
    answer to WHERE did the level shift happen (CUSUM says WHETHER and
    roughly when an alarm fires; binary segmentation names the optimal
    split, and is the recursion step of the classic changepoint tree).

    Exactness: with prefix sums S_k over integer cents, the between-SS
    gain at split k is (n*S_k - k*S_n)^2 / (k*(n-k)*n) -- numerator an
    EXACT DECIMAL(38,0) integer square, one double division per candidate
    split, argmax tie-broken by day. Plan: one day-grain rollup, one
    prefix-sum window over the ~2.4k-day spine, one TakeOrdered(1)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    pre = daily.select(
        "day",
        F.row_number().over(Window.orderBy("day")).alias("k"),
        F.sum(F.col("rev").cast("decimal(38,0)")).over(w).alias("sk"),
        F.count(F.lit(1)).over(tot).alias("n"),
        F.sum(F.col("rev").cast("decimal(38,0)")).over(tot).alias("sn"),
    ).filter(F.col("k") < F.col("n"))
    num = (F.col("n") * F.col("sk") - F.col("k") * F.col("sn")).cast("decimal(38,0)")
    gain = (num * num).cast("double") / (
        (F.col("k") * (F.col("n") - F.col("k"))).cast("double") * F.col("n").cast("double")
    )
    scored = pre.select(
        "day", "k", "n", "sk", "sn", F.round(gain, 6).alias("gain")
    ).orderBy(F.col("gain").desc(), "day").limit(1)
    return scored.select(
        F.col("n").alias("n_days"),
        F.date_format("day", "yyyy-MM-dd").alias("split_day"),
        F.col("k").alias("days_before"),
        F.round(F.col("sk").cast("double") / F.col("k") / 100.0, 2).alias("left_mean_usd"),
        F.round(
            (F.col("sn") - F.col("sk")).cast("double") / (F.col("n") - F.col("k")) / 100.0, 2
        ).alias("right_mean_usd"),
        F.round(F.col("gain") / 10000.0, 2).alias("gain_usd_sq"),
    )


AMS_JOIN_K = 32
AMS_JOIN_SEED = "amsj6"


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS inner-product join-size estimation, audited against the exact
    answer: |R join S on k| = sum_k f_R(k) * f_S(k), and the same +/-1
    sign sketches whose squares estimate F2 estimate this inner product
    as mean_j(X_j * Y_j) -- the question a distributed planner asks
    BEFORE committing a shuffle join (will events x orders on the user
    key explode?), answered from two mergeable 32-number sketches instead
    of a trial join.

    Determinism: the two sketches share one md5 sign family (seeded per
    projection j), X_j/Y_j accumulate as DECIMAL(38,0) over exact integer
    frequencies, and the estimator is integer algebra until one final
    division. Scale shape: one keyed count per side (partial-agg
    shuffles), then vocabulary-sized sign tables and K partial sums --
    the sketches fold map-side like any linear sketch."""
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    # checkpoint the keyed counts: both feed the sketch aggregate AND the
    # exact join, and without it Spark replays each groupBy shuffle twice
    fe = (
        ev.groupBy(F.col("user_id").cast("long").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    fo = (
        orders.groupBy(F.col("o_custkey").cast("long").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )

    def sign(j: int):
        nib = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{AMS_JOIN_SEED}{j}:"), F.col("k").cast("string"))), 1, 1
            ),
            16,
            10,
        ).cast("int")
        return (nib % 2) * 2 - 1

    def sketch(df, prefix: str):
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias(f"{prefix}_keys"),
            F.sum("c").cast("bigint").alias(f"{prefix}_rows"),
            *[
                F.sum((F.col("c") * sign(j)).cast("decimal(38,0)"))
                .cast("long")
                .alias(f"{prefix}x{j}")
                for j in range(AMS_JOIN_K)
            ],
        )
    exact = (
        fe.select("k", F.col("c").alias("ce"))
        .join(fo.select("k", F.col("c").alias("co")), "k")
        .agg(
            F.sum((F.col("ce") * F.col("co")).cast("decimal(38,0)"))
            .cast("bigint")
            .alias("exact_join_size")
        )
    )
    prod = None
    for j in range(AMS_JOIN_K):
        t = F.col(f"ex{j}") * F.col(f"ox{j}")
        prod = t if prod is None else prod + t
    return (
        sketch(fe, "e")
        .crossJoin(F.broadcast(sketch(fo, "o")))
        .crossJoin(F.broadcast(exact))
        .select(
            "e_keys",
            "e_rows",
            "o_keys",
            "o_rows",
            "exact_join_size",
            F.round(prod.cast("double") / AMS_JOIN_K, 4).alias("ams_estimate"),
            F.round(
                F.abs(F.round(prod.cast("double") / AMS_JOIN_K, 4) - F.col("exact_join_size"))
                / F.col("exact_join_size"),
                6,
            ).alias("rel_error"),
        )
    )


def q_mase_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE (mean absolute scaled error, Hyndman & Koehler 2006) of the
    seasonal-naive forecast on daily revenue: predict each day with the
    value 7 rows back and scale its MAE by the one-step naive MAE -- the
    unit-free fixture every forecasting bake-off reports first (MASE < 1
    beats the random-walk baseline; with strong weekly seasonality the
    seasonal naive should). Integer-exact: both MAEs are sums of absolute
    integer-cent differences over the day spine, one double division at
    the end.

    Plan: one orders rollup shuffle, two lag windows over the ~2.4k-row
    day series (single-partition by design, like every stat on this
    shelf), one scalar aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "rev",
        F.lag("rev", 7).over(w).alias("l7"),
        F.lag("rev", 1).over(w).alias("l1"),
    ).filter(F.col("l7").isNotNull())
    g = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days_scored"),
        F.sum(F.abs(F.col("rev") - F.col("l7")).cast("decimal(38,0)"))
        .cast("long")
        .alias("e7"),
        F.sum(F.abs(F.col("rev") - F.col("l1")).cast("decimal(38,0)"))
        .cast("long")
        .alias("e1"),
    )
    return g.select(
        "n_days_scored",
        F.round(F.col("e7").cast("double") / F.col("n_days_scored") / 100.0, 2).alias(
            "mae_seasonal_usd"
        ),
        F.round(F.col("e1").cast("double") / F.col("n_days_scored") / 100.0, 2).alias(
            "mae_naive_usd"
        ),
        F.round(F.try_divide(F.col("e7").cast("double"), F.col("e1")), 6).alias("mase"),
    )


def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta effect size between 1-URGENT and 5-LOW order values --
    the scale-free companion to q_mann_whitney_u (U says whether the two
    distributions differ; delta says by HOW MUCH, on the universal
    [-1, 1] dominance scale an analyst can threshold: |d| < 0.147 is
    negligible, > 0.474 large).  delta = (#(x>y) - #(x<y)) / (n1*n2) over
    all cross-group pairs, computed WITHOUT the n1*n2 pairs via the
    midrank identity delta = (2*U1 - n1*n2) / (n1*n2) where
    U1 = R1 - n1(n1+1)/2 from midrank sums.

    Portability: values are compared at integer cents grain; midranks are
    exact dyadic rationals; every sum fits a double exactly; the single
    final division is one IEEE op -- hash-exact with no decimal scaffolding.

    Plan: one groupBy on the cents key compresses both groups to the
    distinct-value rank table, one cumulative window over it, one scalar
    agg -- same shape as mann_whitney_u; the fact table is touched once."""
    o = load_table(spark, sf_dir, "orders")
    two = o.filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW")).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderpriority") == "1-URGENT").cast("bigint").alias("is_a"),
    )
    by_val = two.groupBy("cents").agg(
        F.count(F.lit(1)).alias("c_all"), F.sum("is_a").alias("c_a")
    )
    # data-derived cents grid -> range-partitioned cumulative counts
    from pgsf_spark.operators.ranking import global_cumsum

    ranked = global_cumsum(
        by_val, [F.col("cents").asc()], {"cum_less": (F.col("c_all"), False)}
    ).withColumn("avg_rank", F.col("cum_less") + (F.col("c_all") + 1) / 2.0)
    g = ranked.agg(
        F.sum("c_a").cast("bigint").alias("n_urgent"),
        (F.sum("c_all") - F.sum("c_a")).cast("bigint").alias("n_low"),
        F.sum(F.col("c_a") * F.col("avg_rank")).alias("r1"),
    )
    u1 = F.col("r1") - (F.col("n_urgent") * (F.col("n_urgent") + 1)) / 2.0
    pairs = (F.col("n_urgent") * F.col("n_low")).cast("double")
    return g.select(
        "n_urgent",
        "n_low",
        u1.alias("u_statistic"),
        F.round(F.try_divide(F.lit(2.0) * u1 - pairs, pairs), 6).alias("cliffs_delta"),
    )


# candidate functional dependencies audited by q_fd_violation_audit:
# (name, table, lhs, rhs) -- g3 = min fraction of rows to delete for
# lhs -> rhs to hold exactly
FD_CANDIDATES = (
    ("source_determines_lang", "documents", "source", "lang"),
    ("user_determines_type", "events", "user_id", "event_type"),
    ("custkey_determines_priority", "orders", "o_custkey", "o_orderpriority"),
    ("brand_determines_type", "part", "p_brand", "p_type"),
)


def q_fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional-dependency audit (the Tane/Deequ g3 measure)
    over four candidate dependencies -- the schema-discovery gate that
    tells a pipeline which "looks like a key" relationships actually hold:
    g3(lhs -> rhs) = 1 - sum_over_lhs(max rhs-group count) / n, the minimum
    fraction of rows that must be deleted for the FD to hold exactly.  A
    near-zero g3 marks a dependable join/partition key; a large one kills
    the assumption before it ships as a dedup or merge rule.

    Exactness: numerator and denominator are integer counts; the one
    division per candidate is a single IEEE op.  Plan: per candidate one
    groupBy(lhs, rhs) partial-agg shuffle then one groupBy(lhs) max --
    both keyed, no windows; the four audits union into one result after
    each collapses to a single row."""
    parts = []
    for fd_name, table, lhs, rhs in FD_CANDIDATES:
        t = load_table(spark, sf_dir, table)
        cells = t.groupBy(F.col(lhs).alias("l"), F.col(rhs).alias("r")).agg(
            F.count(F.lit(1)).alias("c")
        )
        keep = cells.groupBy("l").agg(F.max("c").alias("mx"), F.sum("c").alias("n_l"))
        parts.append(
            keep.agg(
                F.lit(fd_name).alias("fd"),
                F.sum("n_l").cast("bigint").alias("n_rows"),
                F.count(F.lit(1)).cast("bigint").alias("n_lhs"),
                F.sum("mx").cast("bigint").alias("n_keep"),
            ).select(
                "fd",
                "n_rows",
                "n_lhs",
                (F.col("n_rows") - F.col("n_keep")).alias("n_violations"),
                F.round(
                    (F.col("n_rows") - F.col("n_keep")).cast("double")
                    / F.col("n_rows").cast("double"),
                    6,
                ).alias("g3"),
                (F.col("n_rows") == F.col("n_keep")).alias("holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("fd")


BH_ALPHA = 0.05  # family-wise FDR level for the per-nation test family
BH_M = 25  # the test family is the fixed 25-nation design


def _bh_thresholds(m: int = BH_M, alpha: float = BH_ALPHA) -> list[float]:
    """|z| cutoffs t_i = Phi^-1(1 - alpha*i/(2m)) for BH rank i = 1..m,
    via stdlib-erf bisection (no scipy).  BH on two-sided normal p-values
    p = 2(1 - Phi(|z|)) is EQUIVALENT to step-up on |z| against these
    cutoffs -- which keeps erf/exp out of the gated columns entirely (the
    house softsign-not-exp portability rule): the engines only compare
    |z| doubles against literal constants embedded identically in both
    faces."""
    import math

    def ppf(p: float) -> float:
        lo, hi = 0.0, 10.0
        for _ in range(80):
            mid = (lo + hi) / 2
            if 0.5 * (1 + math.erf(mid / math.sqrt(2))) < p:
                lo = mid
            else:
                hi = mid
        return (lo + hi) / 2

    return [round(ppf(1 - alpha * i / (2 * m)), 6) for i in range(1, m + 1)]


def q_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the 25-nation family of
    one-sample z-tests (each nation's mean order value against the global
    mean at global sigma) -- the multiple-comparisons gate every
    per-segment dashboard needs: without it, 25 simultaneous tests at
    alpha = 0.05 expect a false "significant nation" weekly.  The step-up
    rule rejects ranks 1..k* where k* is the largest rank whose |z| clears
    its rank's cutoff.

    Portability: the normal inverse lives in PYTHON (module-level
    constants from stdlib erf bisection, identical literals in both
    faces); the engines do only integer-moment arithmetic, one fixed
    double chain per nation, and comparisons against those literals --
    no erf/exp in any gated column.

    Plan: one customer-orders equi-join (customer side broadcast at
    dimension scale), one nation-keyed moment aggregate, one single-row
    global moment aggregate broadcast back; ranking and step-up run on
    the 25-row nation table (dimension-sized window, documented)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rows = o.join(
        F.broadcast(c.select("c_custkey", "c_nationkey")),
        o.o_custkey == c.c_custkey,
    ).select(
        F.col("c_nationkey").alias("nation"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    per_nation = rows.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
    )
    # (19,0) x (19,0) -> (38,0): the square stays inside Spark's precision
    # cap (38,0 x 38,0 would truncate)
    sq = F.col("cents").cast("decimal(19,0)")
    glob = rows.agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("g1"),
        F.sum(sq * sq).alias("g2"),
    )
    mean_i = F.col("s1").cast("double") / F.col("n").cast("double")
    mean_g = F.col("g1").cast("double") / F.col("ng").cast("double")
    var_g = F.col("g2").cast("double") / F.col("ng").cast("double") - mean_g * mean_g
    z = F.round(
        (mean_i - mean_g) / F.sqrt(var_g) * F.sqrt(F.col("n").cast("double")), 6
    )
    scored = per_nation.crossJoin(F.broadcast(glob)).select(
        "nation", F.col("n").cast("bigint").alias("n_orders"), z.alias("z")
    )
    wr = Window.orderBy(F.abs(F.col("z")).desc(), "nation")
    thr = F.element_at(
        F.array(*[F.lit(t) for t in _bh_thresholds()]), F.col("bh_rank")
    )
    ranked = (
        scored.withColumn("bh_rank", F.row_number().over(wr))
        .withColumn("bh_threshold", thr)
        .withColumn("clears", (F.abs(F.col("z")) >= F.col("bh_threshold")).cast("int"))
    )
    wall = Window.partitionBy()
    kstar = F.max(F.col("clears") * F.col("bh_rank")).over(wall)
    return (
        ranked.withColumn("rejected", F.col("bh_rank") <= kstar)
        .select("nation", "n_orders", "z", "bh_rank", "bh_threshold", "rejected")
        .orderBy("bh_rank")
    )


EWMA_ALPHA = 0.2  # smoothing constant
EWMA_LAGS = 60  # truncated-kernel depth: 0.8^60 ~ 1.5e-6 of a day's weight
EWMA_Z = 3.162278  # 3 * sqrt(1 + alpha/(2-alpha)): prediction-error limit


def q_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over daily revenue -- the drift-sensitive
    anomaly monitor next to q_revenue_anomaly_days (which flags against a
    global mean; EWMA flags against the RECENT level, catching slow-onset
    shifts a static band misses).  Each day's prediction is the
    exponentially-weighted mean of the previous EWMA_LAGS days
    (alpha (1-alpha)^k kernel, truncated where the weight is ~1e-6 --
    truncation applied identically on both faces, so parity is exact);
    the day's z-score is (rev - ewma_prev) / sigma, flagged beyond
    EWMA_Z = 3 sqrt(1 + alpha/(2-alpha)), the asymptotic sigma of a
    one-step EWMA prediction error.  Emits the top 10 days by |z|.

    Exactness: revenue is integer cents; each kernel term is one python
    double literal times an integer, summed in a FIXED left-to-right
    chain (the lag unroll pins the order on both faces); sigma comes from
    exact decimal moments; z is a fixed double chain rounded to 6.

    Plan: one orders rollup shuffle to day grain, lag windows over the
    ~2.4k-row day spine (single-partition by design, documented house
    pattern for this shelf), one broadcast of the 1-row moment aggregate,
    one top-10."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    w = Window.orderBy("day")
    ew = None
    for k in range(1, EWMA_LAGS + 1):
        wt = EWMA_ALPHA * (1.0 - EWMA_ALPHA) ** (k - 1)
        term = F.lit(wt) * F.lag("rev", k).over(w).cast("double")
        ew = term if ew is None else ew + term
    rn = F.row_number().over(w)
    pred = daily.withColumn("ewma_prev", F.round(ew, 4)).withColumn("rn", rn).filter(
        F.col("rn") > EWMA_LAGS
    )
    dec = "decimal(38,0)"
    sq = F.col("rev").cast("decimal(19,0)")
    mom = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("rev").cast(dec)).alias("s1"),
        F.sum(sq * sq).alias("s2"),
    )
    mean_g = F.col("s1").cast("double") / F.col("n").cast("double")
    var_g = F.col("s2").cast("double") / F.col("n").cast("double") - mean_g * mean_g
    z = F.round((F.col("rev").cast("double") - F.col("ewma_prev")) / F.sqrt(var_g), 6)
    return (
        pred.crossJoin(F.broadcast(mom))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.col("rev") / 100.0, 2).alias("rev_usd"),
            F.round(F.col("ewma_prev") / 100.0, 4).alias("ewma_usd"),
            z.alias("z"),
            (F.abs(z) > EWMA_Z).alias("is_breach"),
        )
        .orderBy(F.abs(F.col("z")).desc(), "day")
        .limit(10)
    )


CONF_LAG = 7  # seasonal-naive horizon the residuals come from
CONF_Q = 0.9  # target coverage of the conformal interval


def q_conformal_interval_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for the seasonal-naive daily
    revenue forecaster (the q_mase_seasonal_naive baseline): absolute
    residuals |rev_t - rev_{t-7}| are split by day parity into a
    CALIBRATION half (whose CONF_Q-quantile becomes the interval
    half-width q_hat) and an EVAL half (whose share of residuals inside
    q_hat is the achieved coverage).  Coverage far from CONF_Q says the
    interval is mis-sized -- the distribution-free guarantee every
    forecast SLA should gate on, no normality assumed.

    Exactness: residuals are integer cents; q_hat is the same
    interpolated percentile both engines define (the house percentile
    device); coverage is one integer ratio.

    Plan: one orders rollup to day grain, a lag window over the ~2.4k-row
    day spine (single-partition by design, documented house pattern), one
    percentile scalar broadcast back, one aggregate."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    w = Window.orderBy("day")
    r = (
        daily.withColumn("prev", F.lag("rev", CONF_LAG).over(w))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("prev").isNotNull())
        .select("rn", F.abs(F.col("rev") - F.col("prev")).alias("resid"))
    )
    cal = r.filter(F.col("rn") % 2 == 1)
    ev = r.filter(F.col("rn") % 2 == 0)
    qhat = cal.agg(
        F.expr(f"percentile(resid, {CONF_Q}D)").alias("q_hat"),
        F.count(F.lit(1)).alias("n_cal"),
    )
    return (
        ev.crossJoin(F.broadcast(qhat))
        .agg(
            F.first("n_cal").cast("bigint").alias("n_cal"),
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.round(F.first("q_hat") / 100.0, 4).alias("q_hat_usd"),
            F.round(
                F.sum((F.col("resid") <= F.col("q_hat")).cast("long")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("coverage"),
            F.lit(CONF_Q).alias("target"),
        )
    )


GUMBEL_GAMMA = 0.5772156649015329  # Euler-Mascheroni (method-of-moments loc)
GUMBEL_RL_T = 365  # return period (days) for the reported return level
# -ln(-ln(1 - 1/T)): python constant so no nested ln enters a gated column
GUMBEL_RL_FACTOR = 5.8985259242227315


def q_gumbel_maxima_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit of DAILY MAXIMUM order value by the method
    of moments -- the capacity-planning gate (what is the 1-in-365-day
    largest order we should provision for?) the plain mean/stddev shelf
    cannot answer because maxima do not concentrate like means: scale =
    std * sqrt(6) / pi, loc = mean - gamma * scale, and the T-day return
    level is loc + scale * (-ln(-ln(1 - 1/T))) with the doubly-logged
    factor a PYTHON literal (the _bh_thresholds device) so no nested
    libm call enters a gated column.  Also emits the observed maximum's
    standardized position z = (max - loc) / scale.

    Exactness: daily maxima are integers; mean/std come from exact
    decimal moments over the ~2.4k-day series; everything after is one
    fixed double chain against literals.

    Plan: one orders rollup shuffle to (day, max cents), one 1-row moment
    aggregate -- nothing else."""
    import math

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.max(F.round(F.col("o_totalprice") * 100).cast("long")).alias("mx")
    )
    sq = F.col("mx").cast("decimal(19,0)")
    g = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.col("mx").cast("decimal(38,0)")).alias("s1"),
        F.sum(sq * sq).alias("s2"),
        F.max("mx").cast("bigint").alias("observed_max"),
    )
    n = F.col("n_days").cast("double")
    mean = F.col("s1").cast("double") / n
    var = F.col("s2").cast("double") / n - mean * mean
    scale = F.sqrt(var) * float(math.sqrt(6.0) / math.pi)
    loc = mean - F.lit(GUMBEL_GAMMA) * scale
    rl = loc + scale * F.lit(GUMBEL_RL_FACTOR)
    return g.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        "observed_max",
        F.round(loc / 100.0, 4).alias("loc_usd"),
        F.round(scale / 100.0, 4).alias("scale_usd"),
        F.round(rl / 100.0, 4).alias("return_level_365_usd"),
        F.round(
            F.try_divide(F.col("observed_max").cast("double") - loc, scale), 6
        ).alias("max_z"),
    )


VAR_Q = 0.05  # left-tail quantile for VaR / expected shortfall


def q_revenue_var_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk and Expected Shortfall of day-over-day revenue
    changes -- the tail-risk pair (VaR: the 5% worst daily drop;
    ES/CVaR: the AVERAGE drop once you are past VaR, the coherent
    measure stress reviews actually want) over the daily revenue series.

    Exactness: diffs are integer cents from a lag over the day spine;
    VaR is the house interpolated percentile; ES decimal-sums the tail
    (strictly-below-VaR diffs) so accumulation order cannot drift.

    Plan: one orders rollup shuffle, one lag window over the ~2.4k-row
    day spine (single-partition by design, documented), one percentile
    scalar broadcast back, one tail aggregate."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev")
    )
    w = Window.orderBy("day")
    d = (
        daily.withColumn("prev", F.lag("rev", 1).over(w))
        .filter(F.col("prev").isNotNull())
        .select((F.col("rev") - F.col("prev")).alias("diff"))
    )
    v = d.agg(
        F.expr(f"percentile(diff, {VAR_Q}D)").alias("var_c"),
        F.count(F.lit(1)).alias("n_days"),
    )
    t = d.crossJoin(F.broadcast(v))
    return t.agg(
        F.first("n_days").cast("bigint").alias("n_days"),
        F.round(F.first("var_c") / 100.0, 4).alias("var_usd"),
        F.sum((F.col("diff") < F.col("var_c")).cast("long")).cast("bigint").alias("n_tail"),
        F.round(
            F.try_divide(
                F.sum(
                    F.when(F.col("diff") < F.col("var_c"), F.col("diff")).cast(
                        "decimal(38,0)"
                    )
                ).cast("double"),
                F.sum((F.col("diff") < F.col("var_c")).cast("long")).cast("double"),
            )
            / 100.0,
            4,
        ).alias("es_usd"),
    )


# categorical pairs audited by q_categorical_mutual_information
MI_PAIRS = (
    ("source_vs_lang", "documents", "source", "lang"),
    ("segment_vs_nation", "customer", "c_mktsegment", "c_nationkey"),
)


def q_categorical_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (and sqrt-normalized NMI) between categorical
    column pairs -- the symmetric dependence gate next to the directional
    FD audit (g3 says whether lhs DETERMINES rhs; MI says how much
    knowing either tells you about the other, which is what feature
    selection and leakage review actually ask): MI = sum p_ij
    ln(p_ij / (p_i p_j)), NMI = MI / sqrt(H(X) H(Y)).

    Exactness: every ln argument is a ratio of exact integer products
    (carried as doubles to dodge 100 TB int64 overflow); each ln rounds
    to 9, each p * ln term rounds to 12 and decimal-sums, so MI and both
    entropies are order-independent; try_divide makes a degenerate
    single-category pair NULL.

    Plan: per pair one groupBy(cell) shuffle plus two margin rollups of
    the cell table; terms live on the <= |X| * |Y| cell rows."""
    dec = "decimal(27,12)"
    parts = []
    for pair_name, table, xc, yc in MI_PAIRS:
        t = load_table(spark, sf_dir, table)
        # bounded materialization (<= |X| x |Y| cells): margins, total, and
        # the term join would otherwise each re-run the table rollup
        cells = (
            t.groupBy(F.col(xc).alias("x"), F.col(yc).alias("y"))
            .agg(F.count(F.lit(1)).alias("c"))
            .localCheckpoint(eager=True)
        )
        rx = cells.groupBy("x").agg(F.sum("c").alias("rx"))
        ry = cells.groupBy("y").agg(F.sum("c").alias("ry"))
        tot = cells.agg(F.sum("c").alias("n"))
        j = (
            cells.join(F.broadcast(rx), "x")
            .join(F.broadcast(ry), "y")
            .crossJoin(F.broadcast(tot))
        )
        cd, rxd, ryd, nd = (F.col(k).cast("double") for k in ("c", "rx", "ry", "n"))
        lnr = F.round(F.log(cd * nd / (rxd * ryd)), 9)
        mi_t = F.round(cd / nd * lnr, 12).cast(dec)
        g = j.agg(
            F.first("n").alias("n"),
            F.sum(mi_t).cast("double").alias("mi"),
        )
        hx = rx.crossJoin(F.broadcast(tot)).agg(
            F.sum(
                F.round(
                    -(F.col("rx").cast("double") / F.col("n").cast("double"))
                    * F.round(
                        F.log(F.col("rx").cast("double") / F.col("n").cast("double")), 9
                    ),
                    12,
                ).cast(dec)
            )
            .cast("double")
            .alias("hx")
        )
        hy = ry.crossJoin(F.broadcast(tot)).agg(
            F.sum(
                F.round(
                    -(F.col("ry").cast("double") / F.col("n").cast("double"))
                    * F.round(
                        F.log(F.col("ry").cast("double") / F.col("n").cast("double")), 9
                    ),
                    12,
                ).cast(dec)
            )
            .cast("double")
            .alias("hy")
        )
        parts.append(
            g.crossJoin(F.broadcast(hx))
            .crossJoin(F.broadcast(hy))
            .select(
                F.lit(pair_name).alias("pair"),
                F.col("n").cast("bigint").alias("n_rows"),
                F.round("mi", 6).alias("mi_nats"),
                F.round("hx", 6).alias("h_x"),
                F.round("hy", 6).alias("h_y"),
                F.round(
                    F.try_divide(F.col("mi"), F.sqrt(F.col("hx") * F.col("hy"))), 6
                ).alias("nmi"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("pair")


HURST_WINDOWS = (8, 16, 32, 64, 128)  # R/S block sizes


def _hurst_weights() -> dict[int, float]:
    """OLS slope weights for ln(mean R/S) on ln(w): slope = sum_w
    weight_w * y_w with weight_w = (ln w - mean ln w) / sum (ln w -
    mean)^2 -- python literals, so the engines only form one fixed
    linear combination (the _bh_thresholds device)."""
    import math

    xs = [math.log(w) for w in HURST_WINDOWS]
    xbar = sum(xs) / len(xs)
    den = sum((x - xbar) ** 2 for x in xs)
    return {
        w: round((x - xbar) / den, 12) for w, x in zip(HURST_WINDOWS, xs)
    }


def q_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily revenue by rescaled-range (R/S) analysis
    -- the long-memory diagnostic that separates trending (H > 0.5),
    random-walk (H = 0.5), and mean-reverting (H < 0.5) series BEFORE
    anyone picks a forecaster: for each block size w the series splits
    into full blocks, each block contributes R (range of cumulative
    deviations from the block mean) over S (block stddev), and H is the
    OLS slope of ln(mean R/S) on ln(w) -- assembled as one fixed linear
    combination with python-literal weights.

    Exactness: block moments are exact decimal sums of integer cents;
    cumulative deviations round to 6 and decimal-sum inside bounded
    (<= 128-row) per-block windows; R/S rounds to 9 and decimal-sums into
    the per-w mean; the slope terms round to 12.  Zero-variance blocks
    are excluded on both faces.

    Plan: one orders rollup to day grain, a row_number over the ~2.4k-row
    day spine (single-partition by design, documented), then per block
    size one (block)-keyed aggregate pair and per-block bounded windows
    -- nothing data-sized is single-partitioned."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev"))
        .withColumn("rn", F.row_number().over(Window.orderBy("day")))
        .localCheckpoint(eager=True)
    )
    per_w = []
    for w in HURST_WINDOWS:
        # floor division on both faces (the obrien_fleming lesson:
        # DuckDB CAST(double AS INT) rounds, Spark truncates)
        blocks = daily.withColumn("blk", F.floor((F.col("rn") - 1) / w).cast("int"))
        sq = F.col("rev").cast("decimal(19,0)")
        bm = blocks.groupBy("blk").agg(
            F.count(F.lit(1)).alias("bn"),
            F.sum(F.col("rev").cast("decimal(38,0)")).alias("b1"),
            F.sum(sq * sq).alias("b2"),
        ).filter(F.col("bn") == w)
        mean = F.col("b1").cast("double") / F.col("bn").cast("double")
        var = F.col("b2").cast("double") / F.col("bn").cast("double") - mean * mean
        wb = (
            Window.partitionBy("blk")
            .orderBy("rn")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        dev = F.round(F.col("rev").cast("double") - F.col("mean"), 6).cast(
            "decimal(27,6)"
        )
        cum = (
            blocks.join(
                F.broadcast(bm.select("blk", mean.alias("mean"), var.alias("var"))),
                "blk",
            )
            .withColumn("cum", F.sum(dev).over(wb))
        )
        rs = (
            cum.groupBy("blk")
            .agg(
                (F.max("cum") - F.min("cum")).cast("double").alias("r"),
                F.first("var").alias("var"),
            )
            .filter(F.col("var") > 0)
            .select(F.round(F.col("r") / F.sqrt(F.col("var")), 9).alias("rs"))
        )
        per_w.append(
            rs.agg(
                F.lit(w).alias("window_size"),
                F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                F.round(
                    F.sum(F.col("rs").cast("decimal(27,9)")).cast("double")
                    / F.count(F.lit(1)),
                    9,
                ).alias("mean_rs"),
            )
        )
    allw = per_w[0]
    for p in per_w[1:]:
        allw = allw.unionByName(p)
    allw = allw.withColumn("ln_mean_rs", F.round(F.log("mean_rs"), 9))
    wts = _hurst_weights()
    wcol = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(w) for w in HURST_WINDOWS]),
            F.array(*[F.lit(wts[w]) for w in HURST_WINDOWS]),
        ),
        F.col("window_size"),
    )
    slope = allw.agg(
        F.sum(F.round(wcol * F.col("ln_mean_rs"), 12).cast("decimal(27,12)"))
        .cast("double")
        .alias("h")
    )
    return (
        allw.crossJoin(F.broadcast(slope))
        .select(
            "window_size",
            "n_blocks",
            F.round("mean_rs", 6).alias("mean_rs"),
            F.round("ln_mean_rs", 6).alias("ln_mean_rs"),
            F.round("h", 6).alias("hurst"),
        )
        .orderBy("window_size")
    )


def q_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b association between daily revenue and daily order
    count -- the rank-concordance companion to Spearman (tau is the
    probability-scale "if one day beats another on volume, does it beat
    it on revenue?" number, more robust to a few wild days than rho):
    S = sum over day pairs of sign((x_i - x_j)(y_i - y_j)) and
    tau_b = S / sqrt((n0 - tx)(n0 - ty)) with the standard tie terms.

    Exactness: S and the tie terms are EXACT integers; the pairwise pass
    is the deliberate BroadcastNestedLoopJoin over the day-grain series
    (~2.4k rows -> ~3M cheap sign comparisons, the q_mann_kendall_trend
    bounded-calendar device -- NOT a data-sized cross); tau is two IEEE
    ops on exact aggregates with try_divide for all-tied degeneracy.

    Plan: one orders rollup shuffle; pairs, ties, and totals all live on
    the bounded day spine."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    a = daily.select(F.col("day").alias("d1"), F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = daily.select(F.col("day").alias("d2"), F.col("x").alias("x2"), F.col("y").alias("y2"))
    s_agg = a.join(b, F.col("d1") < F.col("d2")).agg(
        F.sum(
            (
                F.signum((F.col("x2") - F.col("x1")).cast("double"))
                * F.signum((F.col("y2") - F.col("y1")).cast("double"))
            ).cast("long")
        ).alias("s")
    )
    tx = daily.groupBy("x").agg(F.count(F.lit(1)).alias("t")).agg(
        F.coalesce(F.sum(F.col("t") * (F.col("t") - 1)), F.lit(0)).alias("tx2")
    )
    ty = daily.groupBy("y").agg(F.count(F.lit(1)).alias("t")).agg(
        F.coalesce(F.sum(F.col("t") * (F.col("t") - 1)), F.lit(0)).alias("ty2")
    )
    n_agg = daily.agg(F.count(F.lit(1)).alias("n"))
    j = s_agg.crossJoin(F.broadcast(n_agg)).crossJoin(F.broadcast(tx)).crossJoin(
        F.broadcast(ty)
    )
    n02 = (F.col("n") * (F.col("n") - 1)).cast("double")  # 2 * n0
    den = F.sqrt((n02 - F.col("tx2").cast("double")) * (n02 - F.col("ty2").cast("double")))
    return j.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("s").cast("bigint").alias("s"),
        # 2*S / sqrt((2n0 - 2tx)(2n0 - 2ty)) == S / sqrt((n0-tx)(n0-ty))
        F.round(F.try_divide(F.lit(2.0) * F.col("s").cast("double"), den), 6).alias(
            "tau_b"
        ),
    )


def q_price_elasticity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price-quantity regression across parts -- the elasticity
    proxy (slope of ln(total quantity) on ln(avg unit price) across the
    catalog; near 0 on this synthetic data, steeply negative on real
    demand): the cross-sectional version of the per-order correlation
    gate, answering the pricing question the correlation alone cannot.

    Exactness: per-part price/quantity aggregates accumulate in integer
    cents/units; both logs round to 9 and the OLS moments decimal-sum
    terms rounded to 12; slope and r^2 are fixed double chains with
    try_divide degeneracy guards.

    Plan: one lineitem rollup keyed on part, one 1-row moment
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
        F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"),
    ).filter((F.col("cents") > 0) & (F.col("qty") > 0))
    xy = per_part.select(
        F.round(
            F.log(F.col("cents").cast("double") / F.col("qty").cast("double")), 9
        ).alias("x"),  # ln(avg unit price in cents)
        F.round(F.log(F.col("qty").cast("double")), 9).alias("y"),
    )
    dec = "decimal(27,12)"
    g = xy.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.round(F.col("x"), 12).cast(dec)).alias("sx"),
        F.sum(F.round(F.col("y"), 12).cast(dec)).alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 12).cast(dec)).alias("sxx"),
        F.sum(F.round(F.col("y") * F.col("y"), 12).cast(dec)).alias("syy"),
        F.sum(F.round(F.col("x") * F.col("y"), 12).cast(dec)).alias("sxy"),
    )
    k = F.col("k").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col(c).cast("double") for c in ("sxx", "syy", "sxy")
    )
    num = k * sxy - sx * sy
    den = k * sxx - sx * sx
    r2num = num * num
    r2den = (k * sxx - sx * sx) * (k * syy - sy * sy)
    return g.select(
        F.col("k").cast("bigint").alias("n_parts"),
        F.round(F.try_divide(num, den), 6).alias("elasticity"),
        F.round(F.try_divide(r2num, r2den), 6).alias("r_squared"),
    )


def q_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue vs its median -- the
    nonparametric randomness gate for the series shelf (trend tests ask
    "is it drifting"; the runs test asks "is it even random": too FEW
    runs means clustering/regimes, too MANY means oscillation):
    R = number of maximal same-sign runs of the above/below-median
    indicator, z = (R - mu) / sigma with mu = 1 + 2 n1 n2 / n and
    sigma^2 = 2 n1 n2 (2 n1 n2 - n) / (n^2 (n - 1)).

    Exactness: daily revenue accumulates in integer cents; the median
    threshold is the SUM of the two middle order statistics so the
    above/below classification is the pure integer compare
    2*cents > m_lo + m_hi (no double median, no interpolation); R, n1,
    n2 are exact integers and z is a fixed double chain with try_divide
    for the degenerate all-one-side series.

    Plan: one orders rollup shuffle; rank, lag, and the run count live
    on the bounded day spine (~2.4k rows/decade, the documented
    single-partition-window device)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    n_agg = daily.agg(F.count(F.lit(1)).alias("n"))
    rn = F.row_number().over(Window.orderBy("cents", "day"))
    ranked = daily.withColumn("rn", rn).crossJoin(F.broadcast(n_agg))
    mids = ranked.agg(
        F.max(
            F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("cents"))
        ).alias("m_lo"),
        F.max(
            F.when(F.col("rn") == F.floor((F.col("n") + 2) / 2), F.col("cents"))
        ).alias("m_hi"),
    )
    flagged = daily.crossJoin(F.broadcast(mids)).select(
        "day",
        (F.col("cents") * 2 > F.col("m_lo") + F.col("m_hi")).cast("int").alias("s"),
    )
    lagged = flagged.withColumn("prev", F.lag("s").over(Window.orderBy("day")))
    agg = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s").alias("n1"),
        (
            F.lit(1)
            + F.sum((F.col("prev").isNotNull() & (F.col("s") != F.col("prev"))).cast("int"))
        ).alias("runs"),
    )
    n1d = F.col("n1").cast("double")
    n2d = (F.col("n") - F.col("n1")).cast("double")
    nd = F.col("n").cast("double")
    p = F.lit(2.0) * n1d * n2d
    mu = F.lit(1.0) + p / nd
    var = (p * (p - nd)) / (nd * nd * (nd - F.lit(1.0)))
    return agg.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("n1").cast("bigint").alias("n_above"),
        (F.col("n") - F.col("n1")).cast("bigint").alias("n_below"),
        F.col("runs").cast("bigint").alias("runs"),
        F.round(mu, 6).alias("expected_runs"),
        F.round(F.try_divide(F.col("runs").cast("double") - mu, F.sqrt(var)), 6).alias(
            "z_score"
        ),
    )


def q_jackknife_se_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP jackknife standard error of the mean order value,
    leaving out one NATION at a time -- the cluster-robust uncertainty
    number the plain s/sqrt(n) understates when orders within a nation
    are correlated (the survey-statistics companion to bootstrap_ci,
    which resamples rows and so assumes independence):
    m_i = mean with nation i removed, se = sqrt((g-1)/g * sum (m_i-m.)^2)
    plus the jackknife bias estimate (g-1)(m. - theta_hat).

    Exactness: per-nation counts and cent sums are exact integers, so
    every leave-one-out mean is ONE double division of exact ints (then
    /100.0 to dollars), rounded to 6 and accumulated with its square in
    DECIMAL -- the sum-order-proof device; the variance combination is a
    fixed double chain on the two exact decimal aggregates, clamped at 0
    before sqrt so 6dp rounding can never produce NaN on one face only.

    Plan: one orders->nation rollup shuffle (customer is broadcast);
    the jackknife algebra runs on the 25-row nation table."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per_nation = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_i"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("s_i"),
        )
    )
    tot = per_nation.agg(
        F.sum("n_i").alias("n"), F.sum("s_i").alias("s"), F.count(F.lit(1)).alias("g")
    )
    loo = per_nation.crossJoin(F.broadcast(tot)).select(
        F.round(
            (
                (F.col("s") - F.col("s_i")).cast("double")
                / (F.col("n") - F.col("n_i")).cast("double")
            )
            / F.lit(100.0),
            6,
        )
        .cast("decimal(14,6)")
        .alias("m"),
        "n",
        "s",
        "g",
    )
    agg = loo.groupBy("n", "s", "g").agg(
        F.sum("m").alias("m1"),
        F.sum(F.col("m") * F.col("m")).alias("m2"),
    )
    gd = F.col("g").cast("double")
    m1d = F.col("m1").cast("double")
    theta = (F.col("s").cast("double") / F.col("n").cast("double")) / F.lit(100.0)
    md = F.col("m2").cast("double") - (m1d * m1d) / gd
    return agg.select(
        F.col("g").cast("bigint").alias("n_nations"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(theta, 6).alias("mean_order_value"),
        F.round(F.sqrt(((gd - F.lit(1.0)) / gd) * F.greatest(md, F.lit(0.0))), 6).alias(
            "jackknife_se"
        ),
        F.round((gd - F.lit(1.0)) * (m1d / gd - theta), 6).alias("jackknife_bias"),
    )


LB_LAGS = 6  # Ljung-Box over lags 1..6 (even df -> closed-form chi2 CDF)
LB_CRIT = 12.591587  # chi2(6) 95th percentile; locked by property test


def q_ljung_box_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau whiteness test on daily revenue -- the
    JOINT autocorrelation gate that goes with q_acf_daily_revenue (the
    ACF reports 7 separate r_k; Ljung-Box asks whether the first 6 are
    collectively zero): Q = n(n+2) sum_k r_k^2/(n-k), compared against
    the chi-square(6) 95% critical value (a python literal, kept out of
    gated columns and locked by the closed-form even-df CDF property
    test in test_literal_constants.py).

    Exactness: r_k reuses the ACF's division-free device (y_t = n*x_t-s
    exact BIGINT, numerators/denominator exact DECIMAL products), so
    each r_k is one double division; each per-lag term r_k^2/(n-k)
    rounds to 12dp into DECIMAL before the cross-lag sum -- accumulation
    order cannot move the hash -- and Q is a fixed double chain on that
    exact sum.

    Plan: identical to the ACF -- one orders rollup shuffle, then the
    bounded day spine."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice")).cast("long")).alias("rev")
    )
    stats = daily.agg(F.sum("rev").alias("s"), F.count(F.lit(1)).alias("n"))
    y = daily.crossJoin(F.broadcast(stats)).select(
        "day", "n", (F.col("n") * F.col("rev") - F.col("s")).alias("y")
    )
    w = Window.orderBy("day")
    dec = "decimal(19,0)"
    lagged = y.select(
        "n",
        "y",
        *[F.lag("y", k).over(w).alias(f"y{k}") for k in range(1, LB_LAGS + 1)],
    )
    terms = lagged.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        (F.col("y").cast(dec) * F.col(f"y{k}").cast(dec)).alias("yy"),
                    )
                    for k in range(1, LB_LAGS + 1)
                ]
            )
        ).alias("t"),
    )
    den = y.agg(F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("den"))
    per_lag = (
        terms.filter(F.col("t.yy").isNotNull())
        .groupBy("n", F.col("t.lag").alias("lag"))
        .agg(F.sum(F.col("t.yy")).alias("num"))
        .crossJoin(F.broadcast(den))
    )
    rho = F.col("num").cast("double") / F.col("den").cast("double")
    term = F.round((rho * rho) / (F.col("n") - F.col("lag")).cast("double"), 12).cast(
        "decimal(18,12)"
    )
    agg = per_lag.groupBy("n").agg(
        F.count(F.lit(1)).alias("n_lags"), F.sum(term).alias("tsum")
    )
    nd = F.col("n").cast("double")
    q = (nd * (nd + F.lit(2.0))) * F.col("tsum").cast("double")
    return agg.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.col("n_lags").cast("bigint").alias("n_lags"),
        F.round(q, 6).alias("q_stat"),
        F.lit(LB_CRIT).alias("chi2_crit_95"),
        (q > F.lit(LB_CRIT)).alias("reject_whiteness"),
    )


def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson first-order autocorrelation statistic on the
    mean-centered daily revenue series -- the regression-residual
    whiteness number (DW ~ 2 means no lag-1 correlation, -> 0 positive,
    -> 4 negative) completing the ACF/Ljung-Box shelf with the classic
    d = sum (y_t - y_{t-1})^2 / sum y_t^2 form.

    Exactness: reuses the ACF's division-free centering (y_t = n*x_t - s
    exact BIGINT; the n^2 factors cancel in the ratio), so BOTH sums are
    exact DECIMAL(38,0) integer accumulations and d is one double
    division, rounded to 6.

    Plan: one orders rollup shuffle, one lag window on the bounded day
    spine."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice")).cast("long")).alias("rev")
    )
    stats = daily.agg(F.sum("rev").alias("s"), F.count(F.lit(1)).alias("n"))
    y = daily.crossJoin(F.broadcast(stats)).select(
        "day", (F.col("n") * F.col("rev") - F.col("s")).alias("y")
    )
    dec = "decimal(19,0)"
    lagged = y.select(
        "y", F.lag("y").over(Window.orderBy("day")).alias("yp")
    )
    agg = lagged.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(
            (F.col("y") - F.col("yp")).cast(dec) * (F.col("y") - F.col("yp")).cast(dec)
        ).alias("num"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("den"),
    )
    return agg.select(
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round(
            F.try_divide(F.col("num").cast("double"), F.col("den").cast("double")), 6
        ).alias("durbin_watson"),
    )


def q_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank-based changepoint test on daily revenue -- the
    nonparametric single-changepoint locator that pairs with CUSUM /
    binary segmentation (those are mean-shift-in-variance detectors;
    Pettitt is the Mann-Whitney form, robust to heavy tails):
    U_t = sum_{i<=t} sum_{j>t} sign(x_i - x_j), K = max_t |U_t|, with
    the changepoint at the argmax day.

    Exactness: by antisymmetry U_t collapses to the cumulative sum of
    each day's Mann-Kendall row score s_i = sum_j sign(x_i - x_j) -- an
    EXACT integer cumsum, no doubles until the reported ln p
    approximation -ln p ~ 6K^2/(n^3 + n^2) (emitted in LOG form; exp is
    libm-unsafe across faces, per the KM/classifier precedent).

    Plan: one orders rollup shuffle; the pairwise sign pass is the
    bounded-calendar BroadcastNestedLoop over the ~2.4k-day spine (the
    mann_kendall device), then one day-ordered cumsum."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    a = daily.select(F.col("day").alias("d1"), F.col("x").alias("x1"))
    b = daily.select(F.col("day").alias("d2"), F.col("x").alias("x2"))
    s = (
        a.join(b, F.col("d1") != F.col("d2"))
        .groupBy("d1")
        .agg(
            F.sum(
                F.signum((F.col("x1") - F.col("x2")).cast("double")).cast("long")
            ).alias("s")
        )
    )
    u = s.select(
        "d1",
        F.sum("s").over(Window.orderBy("d1").rowsBetween(Window.unboundedPreceding, 0)).alias("u"),
    )
    n_agg = daily.agg(F.count(F.lit(1)).alias("n"))
    best = (
        u.orderBy(F.abs(F.col("u")).desc(), "d1")
        .limit(1)
        .crossJoin(F.broadcast(n_agg))
    )
    nd = F.col("n").cast("double")
    k2 = F.col("u").cast("double") * F.col("u").cast("double")
    return best.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.date_format("d1", "yyyy-MM-dd").alias("change_day"),
        F.abs(F.col("u")).cast("bigint").alias("k_stat"),
        F.round(-(F.lit(6.0) * k2) / (nd * nd * nd + nd * nd), 9).alias(
            "ln_approx_p"
        ),
    )


JB_CRIT = 5.991465  # chi2(2) 95th percentile; locked by property test


def q_jarque_bera_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of daily revenue -- the
    moment-based gate (skewness and excess kurtosis jointly zero under
    normality) that completes the distribution shelf next to KS (which
    compares two samples) and Benford (which checks digits):
    JB = n/6 (S^2 + K^2/4) vs the chi-square(2) 95% literal.

    Exactness: the series' first two moments are exact integer sums, so
    mean and sd are fixed double chains; each day's standardized
    z = round((x - mean)/sd, 6) is an identically-computed double, and
    z^3 / z^4 are double products of those ROUNDED values re-rounded to
    9 and decimal-summed -- bounded magnitudes at any corpus scale
    (|z| <~ 10), so no decimal overflow at 100 TB, unlike raw x^4 sums.

    Plan: one orders rollup shuffle, two passes over the bounded day
    spine (moments, then standardized powers)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice")).cast("long")).alias("x")
    )
    dec0 = "decimal(38,0)"
    m = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x").cast(dec0) * F.col("x").cast(dec0)).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    var = F.col("s2").cast("double") / nd - mean * mean
    mz = m.select("n", mean.alias("mean"), F.sqrt(var).alias("sd"))
    z = daily.crossJoin(F.broadcast(mz)).select(
        "n",
        F.round((F.col("x").cast("double") - F.col("mean")) / F.col("sd"), 6).alias(
            "z"
        ),
    )
    d9 = "decimal(18,9)"
    p = z.groupBy("n").agg(
        F.sum(F.round(F.col("z") * F.col("z"), 9).cast(d9)).alias("z2"),
        F.sum(F.round(F.col("z") * F.col("z") * F.col("z"), 9).cast(d9)).alias("z3"),
        F.sum(
            F.round(F.col("z") * F.col("z") * F.col("z") * F.col("z"), 9).cast(d9)
        ).alias("z4"),
    )
    m2 = F.col("z2").cast("double") / nd
    skew = (F.col("z3").cast("double") / nd) / F.sqrt(m2 * m2 * m2)
    kurt = (F.col("z4").cast("double") / nd) / (m2 * m2) - F.lit(3.0)
    jb = (nd / F.lit(6.0)) * (skew * skew + (kurt * kurt) / F.lit(4.0))
    return p.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
        F.round(jb, 6).alias("jb_stat"),
        F.lit(JB_CRIT).alias("chi2_crit_95"),
        (jb > F.lit(JB_CRIT)).alias("reject_normality"),
    )


def q_cramer_von_mises(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramer-von Mises statistic between first-half and
    second-half order values -- the INTEGRATED distribution-drift test
    that completes the two-sample family (KS reacts to the single worst
    ECDF gap; CvM accumulates the whole squared gap, so it sees broad
    small shifts KS misses): T = (n1 n2 / (n1+n2)^2) * sum_k w_k
    (F1(x_k) - F2(x_k))^2 over the pooled sample (w_k = pooled
    multiplicity at the k-th distinct value).

    Exactness: the ECDF gap at each pooled value is the exact integer
    c1*n2 - c2*n1 over the common denominator n1*n2 (the KS device);
    w*(gap)^2 accumulates in DECIMAL(38,0), and T is one fixed double
    chain on three exact integers.

    Plan: identical to KS -- one orders scan, one sort of the pooled
    distinct-value spine with running counts."""
    orders = load_table(spark, sf_dir, "orders")
    # the SAME median-day split as q_ks_test_gate, so KS and CvM gate the
    # same comparison
    sided = orders.crossJoin(
        F.broadcast(
            orders.agg(
                F.expr(
                    "percentile(datediff(to_date(o_orderdate), '1970-01-01'), 0.5D)"
                ).alias("mid")
            )
        )
    ).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        (
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")) <= F.col("mid")
        ).cast("int").alias("s1"),
    )
    per_v = sided.groupBy("v").agg(
        F.sum("s1").alias("w1"), F.sum(1 - F.col("s1")).alias("w2")
    )
    # pooled distinct-cents grid is data-derived: range-partitioned
    # running counts (operators.ranking), not a single-partition window
    from pgsf_spark.operators.ranking import global_cumsum

    ecdf = global_cumsum(
        per_v,
        [F.col("v").asc()],
        {"c1": (F.col("w1"), True), "c2": (F.col("w2"), True)},
    ).select("v", (F.col("w1") + F.col("w2")).alias("w"), "c1", "c2")
    tot = sided.agg(
        F.sum("s1").alias("n1"), F.sum(1 - F.col("s1")).alias("n2")
    )
    dec = "decimal(38,0)"
    j = ecdf.crossJoin(F.broadcast(tot))
    gap = (F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")).cast(dec)
    agg = j.groupBy("n1", "n2").agg(F.sum(F.col("w").cast(dec) * gap * gap).alias("u"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = n1d + n2d
    t = (
        (n1d * n2d / (nd * nd))
        * (F.col("u").cast("double") / ((n1d * n2d) * (n1d * n2d)))
    )
    return agg.select(
        F.col("n1").cast("bigint").alias("n_first_half"),
        F.col("n2").cast("bigint").alias("n_second_half"),
        F.round(t, 6).alias("cvm_stat"),
    )


HAMPEL_K = 3.0  # flag beyond 3 robust sigmas
HAMPEL_HALF = 3  # +-3-day window


def q_hampel_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter over daily revenue -- the ROBUST outlier-day screen
    (the EWMA/anomaly charts use mean/stddev, which an outlier itself
    inflates; Hampel compares each day against its +-3-day window MEDIAN
    with an MAD yardstick, so a single spike cannot hide itself):
    flag |x_t - med_t| > K * 1.4826 * mad_t, interior days only (full
    7-day windows; edges are excluded, stated).

    Exactness: revenue is integer cents; window median and MAD are
    odd-count order statistics (or exact .5 averages), identical
    doubles on both faces; the flag compare and the max deviation ratio
    are fixed chains with try_divide for the zero-MAD flat window.

    Plan: one orders rollup shuffle; the +-3-day neighborhood pairing is
    the bounded-calendar join on the ~2.4k-day spine, then two keyed
    7-row aggregates."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    a = daily.select(F.col("day").alias("t"), F.col("x").alias("xt"))
    b = daily.select(F.col("day").alias("j"), F.col("x").alias("xj"))
    pairs = a.join(
        b,
        (F.datediff(F.col("j"), F.col("t")) >= -HAMPEL_HALF)
        & (F.datediff(F.col("j"), F.col("t")) <= HAMPEL_HALF),
    )
    med = pairs.groupBy("t", "xt").agg(
        F.expr("percentile(xj, 0.5)").alias("med"), F.count(F.lit(1)).alias("cnt")
    )
    mad = (
        pairs.join(med.select("t", "med"), "t")
        .select("t", F.abs(F.col("xj").cast("double") - F.col("med")).alias("dev"))
        .groupBy("t")
        .agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    )
    flagged = (
        med.filter(F.col("cnt") == 2 * HAMPEL_HALF + 1)
        .join(mad, "t")
        .select(
            "t",
            F.try_divide(
                F.abs(F.col("xt").cast("double") - F.col("med")),
                F.lit(1.4826) * F.col("mad"),
            ).alias("ratio"),
        )
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days_checked"),
        F.sum((F.col("ratio") > HAMPEL_K).cast("int")).cast("bigint").alias(
            "n_outliers"
        ),
        F.round(F.max("ratio"), 6).alias("max_deviation_ratio"),
    )


def q_theil_atkinson_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T and Atkinson(eps=2) inequality of customer spend -- the
    DECOMPOSABLE inequality indices next to the Gini gate (Theil splits
    cleanly into within/between-group terms, Atkinson has an explicit
    aversion dial; eps=2 is chosen because its equally-distributed
    equivalent is the HARMONIC mean -- no exp/geomean libm in gated
    columns): T = sum (x/X) ln(n x / X), A2 = 1 - harmonic_mean/mean.

    Exactness: spend is integer cents; each Theil term is a fixed
    double chain rounded to 12 and decimal-summed (order-proof); the
    harmonic mean needs sum(1/x) -- each reciprocal rounds to 15 into
    DECIMAL, same device; zero-spend customers are excluded from both
    indices (stated; ln and 1/x are undefined there).

    Plan: one orders->customer rollup shuffle, one global 1-row
    aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    per = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x"))
        .filter(F.col("x") > 0)
    )
    tot = per.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    j = per.crossJoin(F.broadcast(tot))
    xd = F.col("x").cast("double")
    sd = F.col("s").cast("double")
    nd = F.col("n").cast("double")
    theil_term = F.round((xd / sd) * F.log(nd * xd / sd), 12).cast("decimal(18,12)")
    recip = F.round(F.lit(1.0) / xd, 15).cast("decimal(18,15)")
    agg = j.groupBy("n", "s").agg(
        F.sum(theil_term).alias("t"), F.sum(recip).alias("r")
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    hmean = F.col("n").cast("double") / F.col("r").cast("double")
    return agg.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(F.col("t").cast("double"), 6).alias("theil_t"),
        F.round(F.lit(1.0) - hmean / mean, 6).alias("atkinson_2"),
        F.round(mean / F.lit(100.0), 6).alias("mean_spend"),
        F.round(hmean / F.lit(100.0), 6).alias("harmonic_mean_spend"),
    )


def q_daily_growth_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue growth profile + maximum drawdown -- the
    finance-style risk panel on the revenue series (median growth and
    up-day share describe the typical day; max drawdown is the
    worst peak-to-trough slide, the number a forecaster's SLA quotes):
    g_t = (x_t - x_{t-1}) / x_{t-1}, dd_t = 1 - x_t / max_{s<=t} x_s.

    Exactness: revenue is integer cents; each growth/drawdown value is
    ONE double division of exact ints rounded to 9; the median growth
    is the two-middle-order-statistics SUM compare (integer-rank exact,
    interpolation-free), up-share an integer ratio, max drawdown a
    plain max of identically-rounded doubles.

    Plan: one orders rollup shuffle; lag/rank/running-max windows all
    ride the bounded day spine."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
    )
    wd = Window.orderBy("day")
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    base = daily.select(
        "day",
        "x",
        F.lag("x").over(wd).alias("xp"),
        F.max("x").over(wcum).alias("peak"),
    )
    g = base.filter(F.col("xp").isNotNull()).select(
        "day",
        F.round(
            (F.col("x") - F.col("xp")).cast("double") / F.col("xp").cast("double"), 9
        ).alias("g"),
    )
    rn = F.row_number().over(Window.orderBy("g", "day"))
    cnt = g.agg(F.count(F.lit(1)).alias("m"))
    ranked = g.withColumn("rn", rn).crossJoin(F.broadcast(cnt))
    mids = ranked.agg(
        F.max(
            F.when(F.col("rn") == F.floor((F.col("m") + 1) / 2), F.col("g"))
        ).alias("g_lo"),
        F.max(
            F.when(F.col("rn") == F.floor((F.col("m") + 2) / 2), F.col("g"))
        ).alias("g_hi"),
        F.sum((F.col("g") > 0).cast("int")).alias("n_up"),
        F.max("m").alias("m"),
    )
    dd = base.select(
        F.round(
            F.lit(1.0) - F.col("x").cast("double") / F.col("peak").cast("double"), 9
        ).alias("dd")
    ).agg(F.max("dd").alias("max_dd"))
    return mids.crossJoin(F.broadcast(dd)).select(
        F.col("m").cast("bigint").alias("n_growth_days"),
        F.round((F.col("g_lo") + F.col("g_hi")) / F.lit(2.0), 6).alias(
            "median_growth"
        ),
        F.round(
            F.col("n_up").cast("double") / F.col("m").cast("double"), 6
        ).alias("up_share"),
        F.round(F.col("max_dd"), 6).alias("max_drawdown"),
    )


def q_james_stein_nation_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """James-Stein shrinkage of per-nation mean order values toward the
    grand mean -- the empirical-Bayes estimator that dominates the raw
    per-group means whenever 3+ groups are estimated at once (small
    nations' noisy means get pulled in hard, big nations barely move;
    the same philosophy as the OOF target encoder but with the CLASSIC
    closed-form shrinkage factor): theta_i = m. + c (m_i - m.), with
    c = max(0, 1 - (g-3) sigma2_i.../S) using the positive-part JS form
    on the equal-variance approximation sigma2/n_i ~ pooled.

    Exactness: group counts/sums and the pooled within-group variance
    come from exact integer moments; S = sum (m_i - m.)^2 decimal-sums
    per-group rounded terms; the shrinkage factor and each theta are
    fixed double chains (GREATEST(0,...) both faces).

    Plan: one orders->nation rollup (customer broadcast), 25-row
    algebra after."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    dec = "decimal(38,0)"
    per = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_nationkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_i"),
            F.sum("cents").alias("s_i"),
            F.sum(F.col("cents").cast(dec) * F.col("cents").cast(dec)).alias("q_i"),
        )
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("g"),
        F.sum("n_i").alias("n"),
        F.sum("s_i").alias("s"),
        F.sum("q_i").alias("q"),
    )
    j = per.crossJoin(F.broadcast(tot))
    m_i = F.col("s_i").cast("double") / F.col("n_i").cast("double")
    m_all = F.col("s").cast("double") / F.col("n").cast("double")
    dev = F.round((m_i - m_all) * (m_i - m_all), 6).cast("decimal(27,6)")
    harm = F.round(F.lit(1.0) / F.col("n_i").cast("double"), 15).cast(
        "decimal(18,15)"
    )
    agg = j.groupBy("g", "n", "s", "q").agg(
        F.sum(dev).alias("ss"), F.sum(harm).alias("hh")
    )
    # per-group variance of the mean approximated by the total variance
    # times avg(1/n_i) -- the equal-variance JS form (stated); the
    # positive-part GREATEST(0, .) guard is on both faces
    shrunk = j.crossJoin(F.broadcast(agg.select("ss", "hh")))
    m_i2 = F.col("s_i").cast("double") / F.col("n_i").cast("double")
    m_all2 = F.col("s").cast("double") / F.col("n").cast("double")
    var2 = F.col("q").cast("double") / F.col("n").cast("double") - m_all2 * m_all2
    sig2 = var2 * (
        F.col("hh").cast("double") / F.col("g").cast("double")
    )
    c2 = F.greatest(
        F.lit(0.0),
        F.lit(1.0)
        - ((F.col("g").cast("double") - F.lit(3.0)) * sig2)
        / F.col("ss").cast("double"),
    )
    return shrunk.select(
        F.col("c_nationkey").cast("bigint").alias("nation"),
        F.col("n_i").cast("bigint").alias("n_orders"),
        F.round(m_i2 / F.lit(100.0), 6).alias("raw_mean"),
        F.round(
            (m_all2 + c2 * (m_i2 - m_all2)) / F.lit(100.0), 6
        ).alias("js_mean"),
        F.round(c2, 6).alias("shrinkage_c"),
    ).orderBy("nation")


def q_simpson_paradox_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox probe on the price-quantity relationship -- the
    aggregation-trap alarm every per-segment dashboard needs (a positive
    pooled slope can coexist with negative slopes in every nation; acting
    on the pooled number is then exactly wrong): pooled OLS slope of
    line-item price on quantity vs the per-nation slopes, reporting how
    many nations disagree in SIGN with the pooled fit.

    Exactness: all five OLS moments accumulate per nation in exact
    integer units (cents x quantity products in DECIMAL(38,0)); each
    slope is one fixed double chain; sign comparison is on identically
    computed doubles rounded to 9.

    Plan: one orderkey shuffle join (linear), one nation rollup; the
    pooled moments are the SUM of the per-nation ones -- no second
    scan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_nationkey", "x", "y")
    )
    dec = "decimal(38,0)"
    per = rows.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
    )

    def slope():
        nd = F.col("n").cast("double")
        return F.round(
            F.try_divide(
                nd * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double"),
                nd * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double"),
            ),
            9,
        )

    nation_slopes = per.select("c_nationkey", slope().alias("b"))
    pooled = per.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxx").alias("sxx"),
        F.sum("sxy").alias("sxy"),
    ).select(slope().alias("b_pooled"))
    j = nation_slopes.crossJoin(F.broadcast(pooled))
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nations"),
        F.max("b_pooled").alias("pooled_slope"),
        F.sum(
            (F.signum(F.col("b")) != F.signum(F.col("b_pooled"))).cast("int")
        )
        .cast("bigint")
        .alias("n_opposite_sign"),
        F.round(F.min("b"), 9).alias("min_nation_slope"),
        F.round(F.max("b"), 9).alias("max_nation_slope"),
    )


def q_hll_merge_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by DAY via HLL register merge -- the
    mergeability demonstration that is the whole point of sketches at
    100 TB (registers combine by max(): per-partition sketches merge
    without ever re-touching raw data, so a month's update cost is one
    64-row combine): per-day registers are rolled forward with a
    running max per bucket, each month's estimate is compared against
    the exact cumulative distinct count.

    Exactness: identical register construction to q_hll_portable (md5
    low-bits bucket, string-op rho, exact 2^-M double sum, alpha_64
    literal, unrounded estimate); the exact side is an integer
    first-month rollup.

    Plan: one events scan -> (day, bucket) rollup; the roll-forward is
    a bounded-calendar join on the day spine x 64 registers."""
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    bucket = (h % HLL_M).alias("bucket")
    rest = F.floor(h / HLL_M).cast("long")
    bits = F.lpad(F.bin(rest), 26, "0")
    rho = F.when(rest == 0, F.lit(27)).otherwise(F.instr(bits, "1")).alias("rho")
    month = F.date_format("ts", "yyyy-MM-dd").alias("month")
    per = (
        ev.select(month, bucket, rho)
        .groupBy("month", "bucket")
        .agg(F.max("rho").alias("m"))
    )
    spine = per.select("month").distinct()
    asof = (
        spine.select(F.col("month").alias("mo"))
        .join(per, F.col("month") <= F.col("mo"))
        .groupBy("mo", "bucket")
        .agg(F.max("m").alias("m"))
    )
    s_present = F.sum(F.lit(1.0) / F.expr("cast(shiftleft(1L, m) as double)"))
    est = asof.groupBy("mo").agg(
        s_present.alias("sp"), F.count(F.lit(1)).alias("np")
    ).select(
        "mo",
        (
            F.lit(HLL_ALPHA)
            * F.lit(float(HLL_M * HLL_M))
            / (F.col("sp") + (F.lit(HLL_M) - F.col("np")).cast("double"))
        ).alias("hll_estimate"),
    )
    first = ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("month"), "user_id"
    ).groupBy("user_id").agg(F.min("month").alias("fm"))
    fcnt = first.groupBy("fm").agg(F.count(F.lit(1)).alias("c"))
    exact = (
        spine.select(F.col("month").alias("mo"))
        .join(fcnt, F.col("fm") <= F.col("mo"), "left")
        .groupBy("mo")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("exact_cumulative"))
    )
    return (
        est.join(exact, "mo")
        .select(
            F.col("mo").alias("day"),
            F.col("exact_cumulative").cast("bigint").alias("exact_cumulative"),
            "hll_estimate",
            F.round(
                F.col("hll_estimate") / F.col("exact_cumulative").cast("double")
                - F.lit(1.0),
                4,
            ).alias("rel_error"),
            # raw HLL is only quoted above 2.5m (below that, production
            # uses linear counting -- omitted here for libm-free parity);
            # the flag marks which rows are in the trustworthy regime
            (F.col("hll_estimate") >= F.lit(2.5 * HLL_M)).alias("raw_regime"),
        )
        .orderBy("day")
    )


MCI_Z = 1.959964  # two-sided 95% normal quantile (erf-locked family)


def q_median_ci_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median order
    value -- the binomial order-statistic construction (no normality, no
    bootstrap: ranks floor((n - z sqrt(n))/2) and ceil(1 + (n + z
    sqrt(n))/2) bracket the median with 95% coverage for ANY continuous
    distribution): all three reported values are exact order statistics
    of the integer cent values.

    Exactness: the two bracket ranks are identical double chains on the
    exact n (z is the erf-locked literal); the median is the two-middle
    integer-sum device; the order statistics are rank lookups on the
    cumulative distinct-value spine -- no interpolation anywhere.

    Plan: one distinct-value rollup (the corpus compresses to distinct
    cents), one cumulative window on that spine, three rank lookups."""
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v")
    )
    per_v = vals.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    # distinct-cents grid is data-derived: range-partitioned cumsum
    from pgsf_spark.operators.ranking import global_cumsum

    cum = global_cumsum(
        per_v, [F.col("v").asc()], {"cum": (F.col("c"), True)}
    ).select("v", "cum")
    n_agg = vals.agg(F.count(F.lit(1)).alias("n"))
    j = cum.crossJoin(F.broadcast(n_agg))
    nd = F.col("n").cast("double")
    lo_rank = F.floor((nd - F.lit(MCI_Z) * F.sqrt(nd)) / F.lit(2.0))
    hi_rank = F.ceil(F.lit(1.0) + (nd + F.lit(MCI_Z) * F.sqrt(nd)) / F.lit(2.0))
    m_lo_rank = F.floor((F.col("n") + 1) / 2)
    m_hi_rank = F.floor((F.col("n") + 2) / 2)
    agg = j.groupBy("n").agg(
        F.min(F.when(F.col("cum") >= lo_rank, F.col("v"))).alias("ci_lo"),
        F.min(F.when(F.col("cum") >= hi_rank, F.col("v"))).alias("ci_hi"),
        F.min(F.when(F.col("cum") >= m_lo_rank, F.col("v"))).alias("m_lo"),
        F.min(F.when(F.col("cum") >= m_hi_rank, F.col("v"))).alias("m_hi"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.round((F.col("m_lo") + F.col("m_hi")).cast("double") / F.lit(200.0), 6).alias(
            "median_usd"
        ),
        F.round(F.col("ci_lo").cast("double") / F.lit(100.0), 6).alias("ci95_lo_usd"),
        F.round(F.col("ci_hi").cast("double") / F.lit(100.0), 6).alias("ci95_hi_usd"),
    )


CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_lineitem_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of the four numeric lineitem
    measures -- the feature-profiling panel (collinear features waste
    model capacity and break attribution; quantity-price collinearity is
    also the Simpson probe's raw material): all 6 unordered pairs in ONE
    scan.

    Exactness: every measure quantizes to exact integers (units, cents,
    basis points), all sums/cross-products accumulate in DECIMAL(38,0),
    and each r is one fixed double chain with try_divide for constant
    columns.

    Plan: one lineitem scan, one 1-row aggregate carrying the 14
    moments, then a 6-row literal pair spine."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.round(F.col("l_quantity")).cast("long")
    p = F.round(F.col("l_extendedprice") * 100).cast("long")
    dsc = F.round(F.col("l_discount") * 10000).cast("long")
    tax = F.round(F.col("l_tax") * 10000).cast("long")
    cols = {"l_quantity": q, "l_extendedprice": p, "l_discount": dsc, "l_tax": tax}
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).alias("n")]
    for name, col in cols.items():
        aggs.append(F.sum(col).alias(f"s_{name}"))
        aggs.append(F.sum(col.cast(dec) * col.cast(dec)).alias(f"q_{name}"))
    pairs = [
        (a, b)
        for i, a in enumerate(CORR_COLS)
        for b in CORR_COLS[i + 1 :]
    ]
    for a, b in pairs:
        aggs.append(
            F.sum(cols[a].cast(dec) * cols[b].cast(dec)).alias(f"x_{a}_{b}")
        )
    # one-row moment frame, checkpointed so the 6 pair branches do not
    # re-scan lineitem (the bounded-collect-free union device)
    m = li.agg(*aggs).localCheckpoint(eager=True)
    rows = None
    for a, b in pairs:
        nd = F.col("n").cast("double")
        sa = F.col(f"s_{a}").cast("double")
        sb = F.col(f"s_{b}").cast("double")
        num = nd * F.col(f"x_{a}_{b}").cast("double") - sa * sb
        da = nd * F.col(f"q_{a}").cast("double") - sa * sa
        db = nd * F.col(f"q_{b}").cast("double") - sb * sb
        r = m.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col("n").cast("bigint").alias("n_rows"),
            F.round(F.try_divide(num, F.sqrt(da * db)), 6).alias("pearson_r"),
        )
        rows = r if rows is None else rows.unionAll(r)
    return rows.orderBy("col_a", "col_b")


def q_g_test_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Likelihood-ratio G-test of segment x nation independence -- the
    information-theoretic twin of q_chi_square_independence (G = 2 sum
    o ln(o/e) is additive across partitions of the table, which Pearson
    chi2 is not -- the property that matters when evidence is combined
    across shards): same margins, same dof, plus the mutual-information
    reading G = 2N * MI(nats).

    Exactness: observed counts and margins are integers; each cell's
    o ln(o/e) is a fixed double chain rounded to 9 into DECIMAL before
    the <= 125-cell sum (zero cells contribute 0 exactly -- lim x ln x);
    G and MI are single fixed chains on the exact sum.

    Plan: one customer rollup shuffle; bounded-grid algebra after."""
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    rows_ = cells.groupBy("c_mktsegment").agg(F.sum("o").alias("rt"))
    cols_ = cells.groupBy("c_nationkey").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("n"))
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["c_mktsegment", "c_nationkey"], "left")
        .select(
            "rt", "ct", "n", F.coalesce(F.col("o"), F.lit(0)).alias("o")
        )
    )
    e = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col(
        "n"
    ).cast("double")
    term = F.when(
        F.col("o") > 0,
        F.round(
            F.col("o").cast("double") * F.log(F.col("o").cast("double") / e), 9
        ),
    ).otherwise(F.lit(0.0)).cast("decimal(27,9)")
    agg = grid.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.sum(term).alias("s"),
    )
    g = F.lit(2.0) * F.col("s").cast("double")
    return agg.select(
        "n_customers",
        F.round(g, 6).alias("g_stat"),
        F.round(
            g / (F.lit(2.0) * F.col("n_customers").cast("double")), 9
        ).alias("mutual_information_nats"),
    )


CHI2_RES_TOP = 10


def q_chi2_residuals_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top standardized residuals of the segment x nation table -- WHERE
    the association lives (the omnibus chi2/G say 'dependence exists';
    the residual map (o - e)/sqrt(e) names the cells driving it, the
    part an analyst actually acts on): the CHI2_RES_TOP largest
    |residual| cells with sign.

    Exactness: o, margins, N are integers; each residual is one fixed
    double chain rounded to 6; the top-k order is (abs desc, segment,
    nation) -- fully deterministic.

    Plan: the chi-square grid device; output is a bounded k-row list."""
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    rows_ = cells.groupBy("c_mktsegment").agg(F.sum("o").alias("rt"))
    cols_ = cells.groupBy("c_nationkey").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("n"))
    grid = (
        rows_.crossJoin(F.broadcast(cols_))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["c_mktsegment", "c_nationkey"], "left")
        .select(
            "c_mktsegment",
            "c_nationkey",
            "rt",
            "ct",
            "n",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
    )
    e = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col(
        "n"
    ).cast("double")
    res = F.round((F.col("o").cast("double") - e) / F.sqrt(e), 6)
    return (
        grid.select(
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").cast("bigint").alias("nation"),
            F.col("o").cast("bigint").alias("observed"),
            F.round(e, 6).alias("expected"),
            res.alias("std_residual"),
        )
        .orderBy(F.abs(F.col("std_residual")).desc(), "segment", "nation")
        .limit(CHI2_RES_TOP)
    )

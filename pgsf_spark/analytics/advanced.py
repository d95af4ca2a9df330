"""Advanced relational + temporal operators (extended layer, SURVEY §7.6).

Operators Spark has no single primitive for (as-of join) are composed from
window functions -- the composition is the 100 TB plan (one shuffle on the
key, no range-explosion). Each query keeps a DuckDB oracle in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pgsf_spark.analytics.oracle_utils import dsum
from pgsf_spark.tables import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def q_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the most recent click at-or-before it
    by the same user.

    Spark lacks ASOF JOIN; the scalable composition is a tagged union + a
    running `last(click_ts, ignorenulls)` window: ONE shuffle on user_id,
    no range cross-product. (A DuckDB ASOF JOIN is the oracle.)"""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    # clicks sort before purchases at identical ts => ts >= click_ts matches
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.when(F.col("event_type") == "click", 0).otherwise(1), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.date_format("ts", TS_FMT).alias("purchase_ts"),
            F.date_format("last_click_ts", TS_FMT).alias("click_ts"),
            (F.col("ts").cast("timestamp").cast("long") - F.col("last_click_ts").cast("timestamp").cast("long")).alias(
                "gap_sec"
            ),
        )
    )


def q_clicks_30min_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks in the 30 minutes before each purchase (same user).

    Equi-join on user_id + range predicate -- the shuffle key is user_id, the
    range filter rides the join; with AQE the skewed-user case splits."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(F.col("user_id").alias("cu"), F.col("ts").alias("cts"))
    j = p.join(
        c,
        (F.col("pu") == F.col("cu"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("cts") < F.col("pts")),
        "left",
    )
    return j.groupBy("purchase_id", F.col("pu").alias("user_id")).agg(
        F.count("cts").alias("n_clicks_before")
    )


def q_order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartiles of order value per market segment (linear
    interpolation -- same algorithm as DuckDB quantile_cont)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pct = F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(pct.alias("p"), F.count(F.lit(1)).alias("n_orders"))
        .select(
            "c_mktsegment",
            F.round(F.col("p")[0], 4).alias("p25"),
            F.round(F.col("p")[1], 4).alias("p50"),
            F.round(F.col("p")[2], 4).alias("p75"),
            "n_orders",
        )
    )


def q_cube_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (segment, nation): all four grouping combinations."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .cube("c_mktsegment", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), dsum(F.col("c_acctbal")).alias("total_bal"))
        .select(
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
            "total_bal",
        )
    )


def q_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (each order vs its customer's own average)
    -- decorrelated into a window average, the scalable rewrite."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    avg_exact = F.sum(F.col("o_totalprice").cast("decimal(27,4)")).over(w).cast("double") / F.count(
        F.lit(1)
    ).over(w)
    return (
        o.withColumn("cust_avg", avg_exact)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token frequency top-20 (explode -> count -> top-k with
    deterministic tie-break). The explode fan-out aggregates map-side."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: LSH-bucket candidates for vec 0, exact cosine top-5
    among them. At 100 TB the bucket equi-join replaces the O(n) scan of
    brute force; here both sides derive from the same deterministic bucket
    function so results are reproducible."""
    from pgsf_spark.analytics.similarity import _dot, _to_double, hyperplane_lsh_bucket

    e = load_table(spark, sf_dir, "embeddings")
    e = e.repartition(e.sparkSession.sparkContext.defaultParallelism)
    emb = e.select("vec_id", _to_double(F.col("embedding")).alias("v")).withColumn(
        "bucket", hyperplane_lsh_bucket(F.col("v"))
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    dot = _dot(F.col("v"), F.col("qv"))
    norm = F.sqrt(_dot(F.col("v"), F.col("v"))) * F.sqrt(_dot(F.col("qv"), F.col("qv")))
    return (
        emb.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(dot / norm, 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(5)
    )


def q_moving_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame: 5-row trailing moving average of event value per user
    (ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) + lead/lag deltas."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-4, 0)
    mov = F.sum(F.col("value").cast("decimal(27,6)")).over(frame).cast("double") / F.count(
        F.lit(1)
    ).over(frame)
    return ev.select(
        "event_id",
        "user_id",
        F.round(mov, 4).alias("moving_avg_5"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


def q_event_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window over aggregate: each event type's share of total events
    (two-level aggregation, no self-join)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy()
    return counts.select(
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(total), 6).alias("share"),
        F.rank().over(Window.orderBy(F.col("n").desc(), F.col("event_type"))).alias("rnk"),
    )


def q_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection: customers ordering in both 1995 and 1996."""
    o = load_table(spark, sf_dir, "orders")

    def year(y):
        return o.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01")) & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01"))
        ).select(F.col("o_custkey").alias("c_custkey"))

    return year(1995).intersect(year(1996))


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct (HyperLogLog++), reshaped to an engine-portable
    assertion so a cross-engine oracle exists: the sketch estimate itself is
    engine-specific, but the *claim* "estimate within 10% of exact" is not.
    Spark computes |HLL(rsd=0.02) - exact| / exact <= 0.10; DuckDB asserts the
    same claim from its own exact count (TRUE). HLL++ is deterministic for a
    fixed input, so the boolean is stable across runs; rsd=0.02 puts 10%
    tolerance at 5 sigma. At 100 TB the exact count_distinct companion would
    be dropped and only the sketch kept -- here it doubles as the gate."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count_distinct("user_id").alias("exact_users"),
        (
            F.abs(F.approx_count_distinct("user_id", 0.02) - F.count_distinct("user_id"))
            / F.count_distinct("user_id")
            <= F.lit(0.10)
        ).alias("approx_within_10pct"),
    )


def q_order_quartiles_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile(4) and percent_rank over order value per
    segment (deterministic tie-break by order key so tile boundaries match
    across engines)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            "o_orderkey",
            "c_mktsegment",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        )
    )


def q_events_by_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar extraction: month / day-of-month / hour-of-day breakdown."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("dom"),
            F.hour("ts").alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the engine's SQL surface (distinct
    from rollup/cube: an arbitrary set list)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_order_keys_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: each customer's order keys as a sorted array
    (collect_list is unordered by contract -- sort_array makes it
    deterministic and oracle-comparable)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_custkey") < 50)
        .groupBy("o_custkey")
        .agg(
            # joined to a string: array cells stringify differently across
            # comparison harnesses (numpy vs list), strings never do
            F.array_join(F.sort_array(F.collect_list("o_orderkey")), ",").alias("orderkeys"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value (bucket = floor(v / 50k)) --
    the width_bucket pattern with map-side combine."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(F.floor(F.col("o_totalprice") / 50000).cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/K2 dialect fidelity as a gate query: write customer through the
    pgsf CSV dialect, read it back, aggregate -- the oracle aggregates the
    parquet directly, so any lossy rendering (NULLs, quoting, numerics)
    breaks the hash."""
    import os

    from pgsf_spark.sources.csv_io import read_pgsf_csv, write_pgsf_csv

    c = load_table(spark, sf_dir, "customer")
    path = f"/tmp/pgsf_csv_gate_{os.path.basename(os.path.normpath(sf_dir))}"
    write_pgsf_csv(c, path)
    back = read_pgsf_csv(spark, path, c.schema)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("c_acctbal")).alias("total_bal"),
        F.count_distinct("c_mktsegment").alias("n_segments"),
        F.min("c_name").alias("first_name"),
    )


def q_soql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ad-hoc SOQL surface (S3/P3) exposed as a gate query: the
    translator parses the query and produces the DataFrame plan."""
    from pgsf_spark.soql import run_soql

    return run_soql(
        lambda t: load_table(spark, sf_dir, t),
        "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_nationkey = 7",
    )


def q_approx_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles, reshaped to an engine-portable assertion
    (same pattern as q_approx_distinct_users): Spark's approx_percentile
    (KLL-style, mergeable -- the 100 TB path where an exact global sort is
    off the table) must land within 2% relative of the exact percentile,
    which both engines can verify from the exact value. accuracy=10000
    bounds rank error at 0.01%, so 2% value tolerance is conservative."""
    o = load_table(spark, sf_dir, "orders")
    exact = F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))")
    approx = F.expr("approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)")
    gates = F.zip_with(
        approx, exact, lambda a, e: (F.abs(a - e) / e <= F.lit(0.02)).cast("int")
    )
    return o.agg(
        F.round(F.element_at(exact, 1), 2).alias("exact_p50"),
        F.round(F.element_at(exact, 2), 2).alias("exact_p90"),
        F.round(F.element_at(exact, 3), 2).alias("exact_p99"),
        (F.aggregate(gates, F.lit(0), lambda acc, x: acc + x) == F.lit(3)).alias(
            "approx_within_2pct"
        ),
    )


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL dialect fidelity as a gate query (the JSONL twin of
    csv_roundtrip): write documents through the JSONL sink, read it back
    with an explicit schema, aggregate content fingerprints -- the oracle
    aggregates the parquet directly, so any lossy escaping (quotes,
    unicode, NULLs) or type drift breaks the hash."""
    import os

    from pgsf_spark.sources.jsonl_io import read_jsonl, write_jsonl

    d = load_table(spark, sf_dir, "documents")
    path = f"/tmp/pgsf_jsonl_gate_{os.path.basename(os.path.normpath(sf_dir))}"
    write_jsonl(d, path)
    back = read_jsonl(spark, path, d.schema)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.count_distinct("lang").alias("n_langs"),
        F.min(F.md5("text")).alias("content_fp"),
        F.sum(F.length("text")).cast("bigint").alias("total_len"),
    )


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source fidelity gate (the third columnar dialect after
    parquet and the CSV/JSONL text dialects): write orders to ORC, read it
    back, aggregate -- the oracle aggregates the parquet directly. ORC is
    in-box for Spark (native vectorized reader), so the only cost of
    supporting it is this gate staying green; timestamps exercise the
    ORC-vs-parquet epoch handling."""
    import os

    o = load_table(spark, sf_dir, "orders")
    path = f"/tmp/pgsf_orc_gate_{os.path.basename(os.path.normpath(sf_dir))}"
    o.write.mode("overwrite").orc(path)
    back = spark.read.schema(o.schema).orc(path)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("o_totalprice")).alias("total"),
        F.count_distinct("o_orderstatus").alias("n_status"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
    )


def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order value -- the optimizer-stats
    shape (equal COUNT per bucket, data-driven boundaries) next to
    price_histogram's equi-WIDTH buckets. Boundaries are exact interpolated
    deciles rounded to 6dp in both engines, so bucket membership is the
    same comparison everywhere; assignment is a fold over the 9-element
    broadcast boundary array (no join, no second shuffle of orders)."""
    o = load_table(spark, sf_dir, "orders")
    qs = [round(x / 10.0, 1) for x in range(1, 10)]
    bounds = o.agg(
        F.expr(
            "transform(percentile(o_totalprice, array({})), b -> round(b, 6))".format(
                ", ".join(str(q) for q in qs)
            )
        ).alias("bounds")
    )
    bucket = F.expr("aggregate(bounds, 0, (acc, b) -> acc + if(o_totalprice > b, 1, 0))")
    return (
        o.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


def q_fixedwidth_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width dialect fidelity gate (the flat-file twin of
    csv/jsonl_roundtrip): write supplier through the fixed-width sink
    (doubles carried as integer cents so the text form is lossless and
    rounding-mode-free), read it back, aggregate -- the oracle aggregates
    the parquet directly with the same cents formula, so any padding,
    trimming, or offset error breaks the hash. The scratch path carries the
    PID so concurrent runs (verify sweep + bench, pytest-xdist) never race
    on mode('overwrite') vs a reader."""
    import os

    from pgsf_spark.sources.fixedwidth_io import FwField, read_fixed_width, write_fixed_width

    s = load_table(spark, sf_dir, "supplier")
    cents = F.floor(F.col("s_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    flat = s.select(
        "s_suppkey", "s_name", "s_nationkey", cents.alias("bal_cents")
    )
    fields = [
        FwField("s_suppkey", 10, "bigint", "right"),
        FwField("s_name", 30, "string", "left"),
        FwField("s_nationkey", 5, "int", "right"),
        FwField("bal_cents", 14, "bigint", "right"),
    ]
    path = (
        f"/tmp/pgsf_fw_gate_{os.path.basename(os.path.normpath(sf_dir))}_{os.getpid()}"
    )
    write_fixed_width(flat, fields, path)
    back = read_fixed_width(spark, path, fields)
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s_suppkey").cast("bigint").alias("key_sum"),
        F.count_distinct("s_nationkey").alias("n_nations"),
        F.min("s_name").alias("first_name"),
        F.sum("bal_cents").cast("bigint").alias("total_cents"),
    )


def q_bloom_join_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered join correctness gate: BUILDING-segment order
    revenue computed through operators/bloomjoin.bloom_semi_join must equal
    the plain join exactly (the bloom only prunes bytes moved; false
    positives die in the exact join). The oracle IS the plain join -- any
    bloom bit error, hash drift, or dropped true positive breaks the hash.

    Scale shape: the dimension's packed filter (~8 KB) rides the scan as a
    pure projection filter, so at 100 TB the orders shuffle under the join
    carries only probable BUILDING customers (~1/5 of rows here) instead of
    the whole fact table."""
    from pgsf_spark.operators.bloomjoin import bloom_semi_join
    from pgsf_spark.analytics.oracle_utils import dsum

    o = load_table(spark, sf_dir, "orders")
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    )
    j = bloom_semi_join(o, c, "o_custkey")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.count_distinct("o_custkey").cast("bigint").alias("n_customers"),
        F.round(dsum(F.col("o_totalprice")), 2).alias("total_revenue"),
        F.count_distinct("c_nationkey").cast("bigint").alias("n_nations"),
    )


def q_snapshot_diff_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation-diff gate: mutate the customer table deterministically
    (md5-selected ~2% deletes, ~5% balance bumps, ~3% segment moves, ~1%
    synthetic inserts), run operators/diff.snapshot_diff old-vs-new, and
    report status counts plus per-column change attribution. The oracle
    rebuilds the identical mutation closed-form and diffs with a full
    outer join -- any marker, null-safety, or attribution bug in the diff
    operator breaks the hash.

    Scale shape: one full-outer join on the key (the diff), aggregates
    over a 4-value status space and a column-count space."""
    from pgsf_spark.operators.diff import snapshot_diff

    c = load_table(spark, sf_dir, "customer")

    def u(tag: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(tag + ":"), F.col("c_custkey").cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            / F.lit(4294967296.0)
        )

    kept = c.filter(u("del") >= 0.02)
    mutated = kept.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.when(u("mod") < 0.05, F.col("c_acctbal") + 10.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.when(u("seg") < 0.03, F.lit("MOVED"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    added = c.filter(u("add") < 0.01).select(
        (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
        "c_name",
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )
    new = mutated.unionByName(added)
    d = snapshot_diff(c.drop("c_comment") if "c_comment" in c.columns else c, new, "c_custkey")
    return d.agg(
        F.sum((F.col("status") == "added").cast("int")).cast("bigint").alias("n_added"),
        F.sum((F.col("status") == "removed").cast("int")).cast("bigint").alias("n_removed"),
        F.sum((F.col("status") == "changed").cast("int")).cast("bigint").alias("n_changed"),
        F.sum((F.col("status") == "unchanged").cast("int")).cast("bigint").alias("n_unchanged"),
        F.sum(F.array_contains("changed_cols", "c_acctbal").cast("int"))
        .cast("bigint")
        .alias("n_changed_acctbal"),
        F.sum(F.array_contains("changed_cols", "c_mktsegment").cast("int"))
        .cast("bigint")
        .alias("n_changed_mktsegment"),
    )


def q_bucketed_join_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located (bucketed) join gate: orders and customer are persisted
    as catalog tables bucketed 16 ways on the SAME key
    (operators/bucketed.py), then joined on that key and rolled up per
    market segment. With both sides pre-bucketed the join plan needs no
    exchange on either side (asserted in test_bucketed.py with broadcast
    disabled); this gate proves the layout changes the PLAN and not the
    ANSWER -- the oracle runs the plain parquet join. At 100 TB this is
    the difference between re-shuffling the fact table on every merge and
    shuffling nothing. Table names carry the sf tag + PID so concurrent
    runs (verify sweep, bench, xdist) never collide."""
    import os

    from pgsf_spark.operators.bucketed import bucketed_join, write_bucketed

    tag = f"{os.path.basename(os.path.normpath(sf_dir)).replace('.', '_')}_{os.getpid()}"
    t_orders, t_cust = f"bk_gate_orders_{tag}", f"bk_gate_customer_{tag}"
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    write_bucketed(o, t_orders, "custkey", n_buckets=16, sort_cols=["custkey"])
    write_bucketed(c, t_cust, "custkey", n_buckets=16, sort_cols=["custkey"])
    j = bucketed_join(spark, t_orders, t_cust, "custkey")
    return j.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct("custkey").alias("n_customers"),
        F.round(dsum(F.col("o_totalprice")), 2).alias("revenue"),
    )


def q_asof_next_purchase_after_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every click, the next purchase strictly
    after it by the same user -- the conversion-latency twin of
    q_asof_click_before_purchase (which looks backward). Forward as-of is
    the attribution primitive "what did this touch lead to".

    Same scalable shape: tagged union + a `first(purchase_ts, ignorenulls)`
    window over the FOLLOWING frame -- one shuffle on user_id, no range
    cross-product. Purchases sort before clicks at identical ts so a
    same-instant purchase does NOT match (strictly-after semantics),
    mirrored in the oracle's > join predicate."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("purchase_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts"),
            F.when(F.col("event_type") == "purchase", 0).otherwise(1),
            F.col("event_id"),
        )
        .rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        tagged.withColumn("next_purchase_ts", F.first("purchase_ts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.date_format("ts", TS_FMT).alias("click_ts"),
            F.date_format("next_purchase_ts", TS_FMT).alias("purchase_ts"),
            (
                F.col("next_purchase_ts").cast("timestamp").cast("long")
                - F.col("ts").cast("timestamp").cast("long")
            ).alias("gap_sec"),
        )
    )


def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: seconds from each user's FIRST view
    to their first qualifying purchase (the funnel's stage-3 entry), as
    exact interpolated quantiles plus mean -- the number a growth team
    tracks weekly.

    Reuses the funnel's chained conditional-min shape (all shuffles on
    user_id, exchange reused); the quantile runs over one row per
    converted user, so the final agg is user-bounded, not event-bounded."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t1"))
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    lat = p.join(v, "user_id").select(
        (F.col("t3").cast("timestamp").cast("long") - F.col("t1").cast("timestamp").cast("long")).alias("sec")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(sec, 0.5)"), 4).alias("p50_sec"),
        F.round(F.expr("percentile(sec, 0.9)"), 4).alias("p90_sec"),
        F.max("sec").alias("max_sec"),
        F.round(F.sum(F.col("sec").cast("decimal(27,4)")).cast("double") / F.count(F.lit(1)), 4).alias("mean_sec"),
    )


def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join without a nested loop: orders priced
    into OVERLAPPING price bands (stride 18k, width 54k -- each order can
    match up to 3 bands, so no single groupBy bucketing can express it)
    via operators/rangejoin.bucketed_range_join.

    Plan: bands explode to ~4 bucket rows each (width/stride + 1), then an
    equi-join on the bucket index + residual filter -- BroadcastHashJoin
    here (exploded bands are tiny), a bucket-keyed shuffle at scale; never
    BroadcastNestedLoopJoin, which is what the naive BETWEEN join plans as
    and what dies first when the ranges side outgrows a broadcast."""
    from pgsf_spark.operators.rangejoin import bucketed_range_join

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    bands = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("band_id"),
        (F.col("n_nationkey").cast("double") * 18000.0).alias("lo"),
        (F.col("n_nationkey").cast("double") * 18000.0 + 54000.0).alias("hi"),
    )
    joined = bucketed_range_join(orders, bands, "o_totalprice", "lo", "hi", 18000.0)
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("sum_price"),
    )


TOPK_STAB_K = 20  # list size audited
TOPK_STAB_SEED = "tks7"  # half-split seed


def q_topk_stability_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k stability under half-sampling: split documents into two
    md5-parity halves, take each half's top-TOPK_STAB_K token list, and
    report the overlap (Jaccard) plus how many tokens hold the SAME rank
    in both -- the resampling-robustness gate every "top terms" dashboard
    needs before anyone acts on list membership (an unstable top-k means
    the ranking is noise below some depth).

    Determinism: both lists use the (count desc, token) total order; the
    split is the md5-parity device; overlap arithmetic is integer.

    Plan: one token rollup per half (shared scan via the split column on
    the same groupBy key), two bounded top-k, a k-row join."""
    d = load_table(spark, sf_dir, "documents")
    split = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{TOPK_STAB_SEED}:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    toks = d.select(
        split.alias("half"),
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    counts = toks.groupBy("half", "token").agg(F.count(F.lit(1)).alias("n"))

    def topk(h: int):
        from pyspark.sql.window import Window

        w = Window.partitionBy("half").orderBy(F.col("n").desc(), "token")
        return (
            counts.filter(F.col("half") == h)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOPK_STAB_K)
            .select(F.col("token"), F.col("rk").alias(f"rk{h}"))
        )

    a, b = topk(0), topk(1)
    j = a.join(b, "token", "full")
    return j.agg(
        F.lit(TOPK_STAB_K).cast("bigint").alias("k"),
        F.sum((F.col("rk0").isNotNull() & F.col("rk1").isNotNull()).cast("long"))
        .cast("bigint")
        .alias("n_common"),
        F.count(F.lit(1)).cast("bigint").alias("n_union"),
        F.round(
            F.sum((F.col("rk0").isNotNull() & F.col("rk1").isNotNull()).cast("long"))
            .cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("jaccard"),
        F.sum((F.col("rk0") == F.col("rk1")).cast("long")).cast("bigint").alias(
            "n_same_rank"
        ),
    )


RBO_P = 0.9  # rank-biased overlap persistence; weights locked by test
RBO_K = 20


def _rbo_weights() -> list:
    """Truncated RBO weights (1-p) p^(d-1) for d = 1..RBO_K -- python
    literals so no pow() enters gated columns."""
    return [round((1 - RBO_P) * RBO_P ** (d - 1), 15) for d in range(1, RBO_K + 1)]


def q_rbo_topk_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap between the two md5-half top-k token lists --
    the PROPER top-weighted list-similarity metric on top of
    q_topk_stability_audit's flat Jaccard (RBO discounts depth
    geometrically, so disagreement at rank 19 matters far less than at
    rank 2 -- the way a human reads a leaderboard): truncated
    RBO_p = sum_d (1-p) p^(d-1) |prefix_A(d) & prefix_B(d)| / d.

    Determinism: the same split/order devices as the stability audit;
    prefix-intersection sizes are exact integers (a token enters at
    depth max(rank_A, rank_B)); the geometric weights are PYTHON
    LITERALS (locked by a sum-identity property test), each depth term
    rounds to 12 into DECIMAL before the sum.

    Plan: two bounded top-k lists, a k-row join, 20-row algebra."""
    d = load_table(spark, sf_dir, "documents")
    split = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{TOPK_STAB_SEED}:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    toks = d.select(
        split.alias("half"),
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
    )
    counts = toks.groupBy("half", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("half").orderBy(F.col("n").desc(), "token")
    ranked = (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RBO_K)
    )
    a = ranked.filter(F.col("half") == 0).select("token", F.col("rk").alias("ra"))
    b = ranked.filter(F.col("half") == 1).select("token", F.col("rk").alias("rb"))
    entry = a.join(b, "token").select(
        F.greatest("ra", "rb").alias("m")
    )
    depth = spark.range(1, RBO_K + 1).select(F.col("id").cast("int").alias("d"))
    inter = depth.join(
        F.broadcast(entry), F.col("m") <= F.col("d"), "left"
    ).groupBy("d").agg(F.count("m").alias("x"))
    wts = F.array(*[F.lit(x) for x in _rbo_weights()])
    term = F.round(
        F.element_at(wts, F.col("d"))
        * (F.col("x").cast("double") / F.col("d").cast("double")),
        12,
    ).cast("decimal(18,12)")
    agg = inter.agg(
        F.sum(term).alias("rbo"),
        F.max(F.when(F.col("d") == RBO_K, F.col("x"))).alias("overlap_at_k"),
    )
    return agg.select(
        F.lit(RBO_K).cast("bigint").alias("k"),
        F.col("overlap_at_k").cast("bigint").alias("overlap_at_k"),
        F.round(F.col("rbo").cast("double"), 6).alias("rbo"),
    )

"""Relational analytics over the replicated star schema (SURVEY §7.6).

Every query here is a (spark, sf_dir) -> DataFrame callable with a matching
DuckDB oracle SQL string in ``registry.py``. Conventions for oracle
hash-parity:
  - every computed column aliased identically in Spark and SQL;
  - float aggregates rounded in-query (sum-order variation at 60k rows is
    ~1e-12 relative -- rounding to 2dp makes the hash stable);
  - timestamps grouped/emitted as formatted strings, never raw.

Scale notes per query in docstrings: these run on ~600k rows locally but the
plan shapes (broadcast dims, partial aggs, single shuffle per agg/join key)
are what survive at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pgsf_spark.analytics.oracle_utils import davg, dsum
from pgsf_spark.tables import load_table


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one shuffle on a 6-value group key; partial
    aggregation map-side; scan prunes to 7 of 11 columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ nation ⋈ orders ⋈ lineitem, revenue per nation.

    nation (25 rows) broadcasts; customer (150k @ sf1) broadcasts under AQE
    at small SF and shuffles at scale -- either way lineitem shuffles at
    most once (on l_orderkey) and the agg key is 25 values."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def q_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier volume in ASIA (c_nationkey =
    s_nationkey equi-constraint rides the join)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+global agg, zero shuffles of data
    (partials only); all three predicates push to the parquet reader."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority counts for 1996 orders that have at least one lineitem
    (semi join -- TPC-H Q4 shape)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.filter((F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01")))
        .join(li.select("l_orderkey").distinct(), o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with deterministic tie-break: global sort is a single
    reduce of per-partition top-k (TakeOrderedAndProject), no full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("total"))
        .orderBy(F.col("total").desc(), F.col("o_orderkey"))
        .limit(25)
    )


def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window ranking: one shuffle on o_custkey, rank within partition."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("total"), "rn")
    )


def q_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order stats incl. customers with no orders (left join)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spent"),
        )
    )


def q_rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate (status, priority) with NULL grouping keys coalesced
    to 'ALL' so the oracle hash is unambiguous."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice")).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate: all four grouping-set combinations of (status,
    priority) in one pass -- the last §7.6 grouping-set shape (ROLLUP's
    sibling). Spark expands the cube map-side before one shuffle; the
    grouping-id column disambiguates a real NULL key from a superaggregate
    row, surfaced here by coalescing to 'ALL' exactly when the grouping bit
    is set (both engines agree on GROUPING())."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("total"),
            # grouping() is only legal inside the cube aggregate itself
            F.grouping("o_orderstatus").alias("g_s"),
            F.grouping("o_orderpriority").alias("g_p"),
        )
        .select(
            F.when(F.col("g_s") == 1, F.lit("ALL")).otherwise(F.col("o_orderstatus")).alias("status"),
            F.when(F.col("g_p") == 1, F.lit("ALL")).otherwise(F.col("o_orderpriority")).alias("priority"),
            "n",
            "total",
        )
    )


def q_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment").distinct()


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-op / anti-join: EXCEPT == left_anti on the key."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.select("c_custkey").exceptAll(o.select(F.col("o_custkey").alias("c_custkey"))).distinct()


def q_count_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT()-only query (S4/A2): answered from parquet footers."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(F.count(F.lit(1)).alias("n"))


def q_snapshot_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 sync-field projection: ReadSchema prunes to 3 columns at the scan."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))


def q_avg_acctbal_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(davg(F.col("c_acctbal")).alias("avg_bal"), F.count(F.lit(1)).alias("n_customers"))
    )


def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between customer-nation and
    supplier-nation pairs by ship year. Two independent broadcast joins to
    the 25-row nation dim under different aliases; lineitem still shuffles
    at most once (for the final agg)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("ck"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("sk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2") & F.col("supp_nation").isin("NATION_1", "NATION_2"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
    )


def q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit proxy (revenue minus a part-cost term) by
    supplier nation and year, filtered to one part type family."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col("p_retailprice") * F.col(
        "l_quantity"
    ) * 0.1
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .filter(F.col("p_type").isin("PROMO", "ECONOMY"))
        .groupBy("n_name", F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(dsum(amount).alias("profit"), F.count(F.lit(1)).alias("n"))
    )


def q_part_type_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join lineitem->part, revenue share of 'PROMO'-like types (Q14 shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n"))
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by pending revenue for one
    market segment. customer filters+broadcasts; lineitem shuffles once on
    l_orderkey; top-k is TakeOrderedAndProject (no global sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = "1997-01-01"
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") > F.lit(cut))
        .join(o.filter(F.col("o_orderdate") < F.lit(cut)), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.filter(F.col("c_mktsegment") == "BUILDING")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
            F.round("revenue", 4).alias("revenue"),
        )
    )


def q_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned items
    in one quarter. Same star-join discipline as revenue_by_nation: the
    fact table shuffles once, dims broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-10-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev).alias("lost_revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name", "n_name",
            F.round("lost_revenue", 4).alias("lost_revenue"),
            "n_items",
        )
    )


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from promo parts in one month.

    part broadcasts (dimension), lineitem never shuffles -- the conditional
    aggregate folds into a single map-side partial + one 1-row exchange.
    At 100 TB this is a pure scan+broadcast plan; the shipdate filter prunes
    row groups via parquet min/max."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))).alias("promo_rev"),
            dsum(rev).alias("total_rev"),
        )
        .select(
            F.round(F.col("promo_rev") * 100.0 / F.col("total_rev"), 6).alias("promo_pct"),
            F.round("promo_rev", 4).alias("promo_rev"),
            F.round("total_rev", 4).alias("total_rev"),
        )
    )


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers whose single orders exceed 300 units.

    The HAVING pre-aggregate runs on lineitem alone (one shuffle on
    l_orderkey, map-side partials), shrinking the fact side to the few
    qualifying orders BEFORE any join -- the joins against orders/customer
    are then broadcast-size at every scale."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.col("sum_qty").desc(), F.col("o_orderkey"))
        .limit(50)
    )


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: per-nation count/balance of above-average-balance
    customers who never placed an order.

    Three classic pieces in one plan: a scalar subquery (global avg over
    positive balances -- a 1-row broadcast), a left-anti join against recent
    orders (the dormancy test; at scale an anti shuffle join on o_custkey
    whose right side pre-filters on the pushed-down date), and a small-key
    aggregate. Catalyst folds the scalar into the filter, so the customer
    scan prunes on the parquet side."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(davg(F.col("c_acctbal")).alias("a"))
    rich = c.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("a"), "inner")
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy(F.col("c_nationkey").cast("int").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("total_bal"),
        )
        .select("c_nationkey", "n_customers", F.round("total_bal", 2).alias("total_bal"))
    )


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of AMERICA's PROMO-part revenue by
    order year. Dims (part, supplier, nation, region) all broadcast; the
    lineitem->orders join is the only data shuffle; the share is a
    conditional aggregate over the same rows (no second pass)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(F.broadcast(p.filter(F.col("p_type") == "PROMO")), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            dsum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))).alias("nation_rev"),
            dsum(rev).alias("total_rev"),
        )
        .select(
            "o_year",
            F.round(F.col("nation_rev") / F.col("total_rev"), 6).alias("mkt_share"),
            F.round("total_rev", 4).alias("total_rev"),
        )
    )


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum 1997-H1 revenue.
    The revenue view aggregates lineitem once on l_suppkey; the scalar max
    broadcasts back over the tiny aggregate (never over lineitem)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter((F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1997-07-01")))
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev == F.col("mx"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_rev", 4).alias("total_rev"))
    )


def q_small_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost by only shipping
    below-20%-of-average quantities of Brand#1 parts. The per-part average
    is a second aggregate over the SAME filtered join (self-referential
    correlated subquery decorrelated into a groupBy + re-join on
    l_partkey -- exactly what a 100 TB plan wants: both sides shrink to the
    brand's parts before any wide work)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    brand = li.join(
        F.broadcast(p.filter(F.col("p_brand") == "Brand#1").select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    avg_qty = brand.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        davg(F.col("l_quantity")).alias("avg_qty")
    )
    return (
        brand.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(dsum(F.col("l_extendedprice")) / 7.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between NATION_1 and NATION_2
    by ship year. Both nation dims broadcast; the supplier/customer joins
    carry the two nation names through the lineitem->orders shuffle (the
    only wide exchange); the OR'd nation-pair filter collapses to two
    broadcast-joined lookups."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .select(
            "supp_nation", "cust_nation", "l_year",
            F.round("revenue", 4).alias("revenue"), "n_items",
        )
    )


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly k orders (k
    including 0 via the left join). Two aggregations: per-customer counts
    (shuffle on o_custkey), then the tiny histogram on the count value."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 spirit (no l_shipmode in the trimmed schema): count
    critical- vs normal-priority orders among lineitems shipped more than
    90 days after the order date in 1997. The join carries only the
    priority and the two dates; the date arithmetic stays in the scan
    projection."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90)
        )
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


def q_discounted_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 spirit: revenue from three OR'd (brand, quantity-range,
    size-range) clauses -- the disjunctive-predicate shape. part broadcasts;
    the disjunction is evaluated post-join but each arm's part-side
    predicate prunes the broadcast build side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    arm1 = (F.col("p_brand") == "Brand#1") & (F.col("l_quantity").between(1, 11)) & (F.col("p_size").between(1, 5))
    arm2 = (F.col("p_brand") == "Brand#2") & (F.col("l_quantity").between(10, 20)) & (F.col("p_size").between(1, 10))
    arm3 = (F.col("p_brand") == "Brand#3") & (F.col("l_quantity").between(20, 30)) & (F.col("p_size").between(1, 15))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(arm1 | arm2 | arm3)
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .select(F.round("revenue", 4).alias("revenue"), "n_items")
    )


def q_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 spirit (no partsupp table): suppliers who shipped more
    than 400 units of PROMO parts during 1997 -- the nested semi-join
    chain (part filter -> lineitem aggregate -> supplier semi-join). The
    part dim broadcasts into the lineitem scan, the per-supplier aggregate
    shuffles once on l_suppkey, and supplier joins the (tiny) qualifying
    set -- at scale the whole subquery side stays broadcast-size."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    shipped = (
        li.filter((F.col("l_shipdate") >= F.lit("1997-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01")))
        .join(F.broadcast(p.filter(F.col("p_type") == "PROMO").select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity")).alias("promo_qty"))
        .filter(F.col("promo_qty") > 400)
    )
    return (
        s.join(shipped, s.s_suppkey == shipped.l_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", F.round("promo_qty", 2).alias("promo_qty"))
        .orderBy("s_suppkey")
    )


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 spirit (no partsupp table: unit cost is derived from
    lineitem as min(extendedprice/quantity) per (part, supplier)). For
    every STANDARD part sized 10-15 find the EUROPE supplier with the
    lowest unit cost -- the correlated-min shape.

    Plan: the per-(part,supplier) aggregate shuffles once on the compound
    key; the correlated MIN is a window over l_partkey (AQE coalesces the
    re-partition); part/supplier/nation/region all broadcast. At 100 TB
    the only wide exchanges are the two keyed aggregates over lineitem --
    there is no join back onto the fact table.

    Reference: the survey's query-shape inventory (SURVEY §2.6 joins /
    correlated aggregates); cites /root/reference semantics only.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    pk = p.filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 15)
    ).select("p_partkey", "p_name", "p_size")
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        # raw IEEE division + MIN: no accumulation, so the double is
        # bit-identical in any engine -- rounding here would only create
        # half-tie divergence
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cost.withColumn("best_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            "s_acctbal", "unit_cost",
        )
    )


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 spirit: parts whose lineitem revenue exceeds 1.5x the
    mean per-part revenue -- the scalar-subquery-threshold shape (the
    mean-based cut is scale-invariant where Q11's fixed fraction is not).
    One keyed aggregate over lineitem; the scalar reuses the per-part
    aggregate (a tiny second agg, NOT a second fact scan) and broadcasts
    back as a 1-row cross join. Decimal accumulation keeps both sums
    order-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        li.groupBy("l_partkey").agg(F.sum(rev.cast("decimal(27,4)")).alias("dvalue"))
    )
    total = per_part.agg(
        F.sum("dvalue").alias("dtotal"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("dvalue").cast("double")
            > F.col("dtotal").cast("double") / F.col("n_parts") * 1.5
        )
        .select(
            "l_partkey",
            F.round(F.col("dvalue").cast("double"), 4).alias("part_value"),
        )
    )


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 spirit: how many distinct suppliers ship each (brand,
    size-band) of non-PROMO parts, excluding blacklisted suppliers
    (negative account balance stands in for the reference's complaints
    filter). The supplier-part relation is derived as distinct
    (l_partkey, l_suppkey) -- one compound-key shuffle; the blacklist is a
    broadcast anti-join; part broadcasts; the final count-distinct
    re-shuffles on the tiny (brand, band) key."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    band = (F.floor(F.col("p_size") / 10) * 10).cast("int")
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p.filter(F.col("p_type") != "PROMO")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", band.alias("size_band"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "size_band")
    )


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 spirit: NATION_1 suppliers who were the SOLE late shipper
    on a multi-supplier order (late = shipped >60 days after the order
    date). The classic formulation is EXISTS + NOT EXISTS self-joins on
    lineitem; here both quantifiers collapse into ONE aggregate over
    l_orderkey (count distinct suppliers / late suppliers + min late
    supplier), which is strictly better at scale: a single shuffle on the
    join key replaces two self-joins of the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    per_order = (
        li.join(o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    nat = s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_1")), s.s_nationkey == n.n_nationkey)
    return (
        per_order.join(F.broadcast(nat.select("s_suppkey", "s_name")), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


def q_brand_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto frontier (skyline): parts not dominated within their
    brand on (price low, size high) -- q dominates p iff q is no more
    expensive AND no smaller AND strictly better on at least one axis. The
    multi-objective shortlist query (cheapest-per-capability) that naive
    engines write as an O(n^2) NOT EXISTS self-join.

    Here it is two window passes per brand over integer cents: dominance by
    a STRICTLY cheaper part is a running max(size) over a RANGE frame ending
    1 cent before the current row; same-price dominance is a max(size) over
    the (brand, cents) peer group. One shuffle on brand, no self-join --
    at 100 TB the skyline of each partition-key group costs one sort.
    Exact-tie pairs (same cents, same size) are mutually non-dominating and
    both survive, matching the NOT EXISTS oracle."""
    p = load_table(spark, sf_dir, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    d = p.select("p_brand", "p_partkey", "p_size", F.col("p_retailprice"), cents.alias("cents"))
    w_cheaper = (
        Window.partitionBy("p_brand")
        .orderBy("cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("p_brand", "cents")
    frontier = (
        d.withColumn("max_size_cheaper", F.max("p_size").over(w_cheaper))
        .withColumn("max_size_same", F.max("p_size").over(w_same))
        .filter(
            (F.col("max_size_cheaper").isNull() | (F.col("max_size_cheaper") < F.col("p_size")))
            & (F.col("max_size_same") <= F.col("p_size"))
        )
    )
    return frontier.select(
        "p_brand", "p_partkey", F.round("p_retailprice", 2).alias("price"), "p_size"
    )


BASKET_MIN_SUPPORT = 2
BASKET_TOP = 20


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: part pairs co-purchased in the same order,
    scored by lift = P(a,b) / (P(a) P(b)) over the order universe -- the
    co-occurrence statistic behind "frequently bought together" and
    item-item collaborative filtering.

    Plan: the distinct (order, part) relation self-joins on l_orderkey --
    per-key fan-out is bounded by basket size (~items-per-order choose 2),
    never corpus-quadratic; marginals are one keyed agg of the same
    relation broadcast back onto the pair aggregate. All lift factors are
    exact BIGINTs; one IEEE division at the end (no libm), same bit in
    every engine. Top-N is TakeOrderedAndProject. At 100 TB the only
    watch-item is a mega-basket (one order with 10^5 items); cap basket
    size upstream or salt that key -- the join key is l_orderkey, so AQE
    skew splitting already covers moderate cases."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= BASKET_MIN_SUPPORT)
    )
    marg = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_orders"))
    n_orders_total = items.agg(F.countDistinct("l_orderkey").alias("n_total"))
    ma = marg.select(F.col("l_partkey").alias("pa"), F.col("n_orders").alias("n_a"))
    mb = marg.select(F.col("l_partkey").alias("pb"), F.col("n_orders").alias("n_b"))
    lift = F.col("n_ab") * F.col("n_total") / (F.col("n_a") * F.col("n_b"))
    return (
        pairs.join(F.broadcast(ma), "pa")
        .join(F.broadcast(mb), "pb")
        .crossJoin(F.broadcast(n_orders_total))
        .select("pa", "pb", "n_ab", "n_a", "n_b", F.round(lift, 4).alias("lift"))
        .orderBy(F.col("lift").desc(), "pa", "pb")
        .limit(BASKET_TOP)
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quintile scores for Recency (days since
    last order, vs the corpus max date), Frequency (order count) and
    Monetary (decimal-exact spend), then the segment-size rollup a CRM
    consumes. ntile(5) agrees between engines when the ORDER BY is total
    (metric, then custkey), so the gate is hash-exact despite ranking.

    Plan: one groupBy(custkey) builds the per-customer triple (shuffle on
    custkey); the three quintile scores come from operators.ranking
    .global_ntile (range partition + per-partition offsets -- NO
    single-partition window, so customer grain scales); the final rollup
    is keyed by 125 segment combinations."""
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(27,4)")).alias("monetary_dec"),
        )
        .crossJoin(anchor)
        .select(
            "o_custkey",
            F.datediff("maxd", "last_order").alias("recency_days"),
            "frequency",
            F.col("monetary_dec").cast("double").alias("monetary"),
        )
    )
    from pgsf_spark.operators.ranking import global_ntile

    scored = global_ntile(
        per_cust, 5, [F.col("recency_days").asc(), F.col("o_custkey").asc()], "r_score"
    )
    scored = global_ntile(
        scored, 5, [F.col("frequency").desc(), F.col("o_custkey").asc()], "f_score"
    )
    scored = global_ntile(
        scored, 5, [F.col("monetary").desc(), F.col("o_custkey").asc()], "m_score"
    ).select("o_custkey", "r_score", "f_score", "m_score", "monetary")
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum(F.col("monetary").cast("decimal(27,4)")).cast("double"), 2).alias(
            "segment_revenue"
        ),
    )


LIFT_DECILES = 10


def q_decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table: rank customers by a score (total spend), cut
    into deciles, and report each decile's response rate (placed at least
    one URGENT order) against the population base rate -- the table every
    targeting/propensity model is actually judged by (does the top decile
    concentrate responders, and how fast does cumulative lift decay).

    Exactness: deciles are a total-order ntile with customer-id
    tie-breaks (the RFM device); response flags, decile counts and
    cumulative sums are integers; rates and lifts are single double
    divisions rounded to 6. Plan: one orders rollup shuffle to customer
    grain (score + response in the same pass), a scale-safe global_ntile
    over the customer table (range partition + offsets, no
    single-partition window), then a 10-row aggregate + 10-row cumulative
    windows (bounded decile spine -- whitelisted in the plan lint)."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("score"),
        F.max((F.col("o_orderpriority") == "1-URGENT").cast("int")).alias("resp"),
    )
    from pgsf_spark.operators.ranking import global_ntile

    ranked = global_ntile(
        cust,
        LIFT_DECILES,
        [F.col("score").desc(), F.col("o_custkey").asc()],
        "decile",
    ).select("resp", "decile")
    dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("resp").cast("bigint").alias("n_resp"),
    )
    tot = Window.partitionBy()
    cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    base = F.sum("n_resp").over(tot).cast("double") / F.sum("n").over(tot).cast("double")
    return dec.select(
        "decile",
        "n",
        "n_resp",
        F.round(F.col("n_resp").cast("double") / F.col("n"), 6).alias("response_rate"),
        F.round(
            F.try_divide(F.col("n_resp").cast("double") / F.col("n"), base), 6
        ).alias("lift"),
        F.round(
            F.try_divide(
                F.sum("n_resp").over(cum).cast("double") / F.sum("n").over(cum),
                base,
            ),
            6,
        ).alias("cum_lift"),
    ).orderBy("decile")


MB_MIN_SUPPORT = 0.005  # rule must cover >= 0.5% of baskets
MB_TOP = 20


def q_market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets at the brand grain (the
    classic support / confidence / lift market-basket mine, Agrawal-style
    but set-expressed: candidate generation IS the basket self-join, no
    Apriori iteration needed for pairs): a basket is the distinct set of
    part brands in one order; a rule x -> y reports
    support = n(x,y)/N, confidence = n(x,y)/n(x), lift = conf/(n(y)/N).

    Exactness: every count is an exact integer (distinct brand-pairs per
    order, distinct orders per brand, total baskets); support and
    confidence are single divisions of exact ints rounded to 6; lift is
    the fixed chain (pair*N)/(ant*cons) in one double division. The
    support floor is a FRACTION (scale-free -- an absolute count floor
    would silently pass everything at 100 TB).

    Plan: part is a tiny dim (broadcast into the lineitem scan); baskets
    are one distinct shuffle keyed on (order, brand); the pair self-join
    is keyed on orderkey so the blow-up is bounded by (brands/order
    choose 2) -- a per-order constant, never data x data; pair counts are
    one keyed shuffle; brand supports and the total are broadcast back.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .distinct()
    )
    n_b = baskets.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    item = baskets.groupBy("brand").agg(F.count(F.lit(1)).alias("n_item"))
    a = baskets.select(F.col("l_orderkey").alias("k"), F.col("brand").alias("x"))
    b = baskets.select(F.col("l_orderkey").alias("k"), F.col("brand").alias("y"))
    pairs = (
        a.join(b, "k")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    # both rule directions from each unordered pair
    rules = pairs.select(
        F.col("x").alias("antecedent"), F.col("y").alias("consequent"), "n_pair"
    ).unionAll(
        pairs.select(
            F.col("y").alias("antecedent"), F.col("x").alias("consequent"), "n_pair"
        )
    )
    ant = item.select(F.col("brand").alias("antecedent"), F.col("n_item").alias("n_ant"))
    cons = item.select(F.col("brand").alias("consequent"), F.col("n_item").alias("n_cons"))
    j = (
        rules.join(F.broadcast(ant), "antecedent")
        .join(F.broadcast(cons), "consequent")
        .crossJoin(F.broadcast(n_b))
    )
    nd = F.col("n_baskets").cast("double")
    support = F.col("n_pair").cast("double") / nd
    out = j.filter(support >= F.lit(MB_MIN_SUPPORT)).select(
        "antecedent",
        "consequent",
        F.col("n_pair").cast("bigint").alias("n_pair"),
        F.round(support, 6).alias("support"),
        F.round(F.col("n_pair").cast("double") / F.col("n_ant").cast("double"), 6).alias(
            "confidence"
        ),
        F.round(
            (F.col("n_pair").cast("double") * nd)
            / (F.col("n_ant").cast("double") * F.col("n_cons").cast("double")),
            6,
        ).alias("lift"),
    )
    return out.orderBy(F.col("lift").desc(), "antecedent", "consequent").limit(MB_TOP)


PIDX_BASE_YEAR = 1995
PIDX_COMP_YEAR = 2000


def q_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices between the base and
    comparison years at the part grain -- the index-number economics the
    plain yearly revenue trend cannot give (it confounds price and
    volume; Laspeyres holds the BASE basket fixed, Paasche the current
    one, Fisher is their geometric mean): unit prices are per-part
    revenue/quantity within each year, over parts transacted in both.

    Exactness: per-part-year quantity and cent-revenue sums are exact
    integers; each part's p*q cross terms are fixed double chains
    rounded to 6 and decimal-summed (sum-order-proof); the three indices
    are single divisions (and one sqrt) of those exact aggregates.

    Plan: one lineitem+orders join keyed on orderkey (both sides big:
    shuffle hash join -- unavoidable and linear), one (part, year)
    rollup, a self-join on the part key, then scalar algebra."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("yr")
    )
    py = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("yr").isin(PIDX_BASE_YEAR, PIDX_COMP_YEAR))
        .groupBy("l_partkey", "yr")
        .agg(
            F.sum(F.round(F.col("l_quantity")).cast("long")).alias("q"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("r"),
        )
        .filter(F.col("q") > 0)
    )
    b = py.filter(F.col("yr") == PIDX_BASE_YEAR).select(
        F.col("l_partkey").alias("pk"), F.col("q").alias("qb"), F.col("r").alias("rb")
    )
    c = py.filter(F.col("yr") == PIDX_COMP_YEAR).select(
        F.col("l_partkey").alias("pk"), F.col("q").alias("qc"), F.col("r").alias("rc")
    )
    j = b.join(c, "pk")
    pb = F.col("rb").cast("double") / F.col("qb").cast("double")
    pc = F.col("rc").cast("double") / F.col("qc").cast("double")
    d6 = "decimal(27,6)"
    agg = j.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.round(pc * F.col("qb").cast("double"), 6).cast(d6)).alias("cb"),
        F.sum(F.round(pb * F.col("qb").cast("double"), 6).cast(d6)).alias("bb"),
        F.sum(F.round(pc * F.col("qc").cast("double"), 6).cast(d6)).alias("cc"),
        F.sum(F.round(pb * F.col("qc").cast("double"), 6).cast(d6)).alias("bc"),
    )
    lasp = F.col("cb").cast("double") / F.col("bb").cast("double")
    paas = F.col("cc").cast("double") / F.col("bc").cast("double")
    return agg.select(
        F.col("n_parts").cast("bigint").alias("n_parts"),
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


LAT_P50 = 0.5
LAT_P90 = 0.9


def q_ship_latency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency profile per order priority -- the
    operational SLA panel (does URGENT actually ship faster?): mean and
    EXACT type-1 p50/p90 day latencies from the integer day-diff
    distribution.

    Exactness: latency is an integer day difference; per-(priority,
    latency) counts are exact, the mean is one division of exact sums,
    and the percentiles are ORDER STATISTICS -- smallest latency whose
    cumulative count reaches ceil(q*n) -- so no interpolation anywhere.

    Plan: one orderkey shuffle join (both sides big, linear), one
    (priority, latency) rollup; the percentile windows ride the bounded
    latency spine (~hundreds of distinct day values) per priority."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("lat"),
    )
    per = lat.groupBy("priority", "lat").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("priority").orderBy("lat").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per.select(
        "priority", "lat", "c", F.sum("c").over(w).alias("cum")
    )
    tot = per.groupBy("priority").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("lat")).alias("s"),
        F.max("lat").alias("max_days"),
    )
    j = cum.join(tot, "priority")
    p50 = F.min(
        F.when(F.col("cum") >= F.ceil(F.lit(LAT_P50) * F.col("n")), F.col("lat"))
    )
    p90 = F.min(
        F.when(F.col("cum") >= F.ceil(F.lit(LAT_P90) * F.col("n")), F.col("lat"))
    )
    return (
        j.groupBy("priority", "n", "s", "max_days")
        .agg(p50.alias("p50_days"), p90.alias("p90_days"))
        .select(
            "priority",
            F.col("n").cast("bigint").alias("n_lineitems"),
            F.round(
                F.col("s").cast("double") / F.col("n").cast("double"), 6
            ).alias("mean_days"),
            F.col("p50_days").cast("bigint").alias("p50_days"),
            F.col("p90_days").cast("bigint").alias("p90_days"),
            F.col("max_days").cast("bigint").alias("max_days"),
        )
        .orderBy("priority")
    )


SALT_N = 8


def q_salted_aggregate_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation vs the direct aggregate -- the skew
    device every 100 TB plan reaches for when one group key carries most
    of the rows (salt the key, pre-aggregate the (key, salt) partials,
    then combine), locked here as a CORRECTNESS gate: on exact integer
    cents the two plans must agree to the last cent, and the gate emits
    both sides with the match flag so a future refactor that breaks
    salt-combine associativity goes red instead of silently skewing.

    Exactness: everything is integer cents; match is integer equality.

    Plan: the direct path is one shuffle on the 3-value flag (the skewed
    shape); the salted path shuffles on (flag, salt) -- SALT_N times the
    keys, 1/SALT_N the per-reducer load -- then combines SALT_N partials
    per flag."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    direct = li.groupBy("l_returnflag").agg(
        F.sum(cents).alias("direct_cents"), F.count(F.lit(1)).alias("n_rows")
    )
    salted = (
        li.select(
            "l_returnflag",
            (F.col("l_orderkey") % SALT_N).alias("salt"),
            cents.alias("c"),
        )
        .groupBy("l_returnflag", "salt")
        .agg(F.sum("c").alias("partial"))
        .groupBy("l_returnflag")
        .agg(
            F.sum("partial").alias("salted_cents"),
            F.count(F.lit(1)).alias("n_salts"),
        )
    )
    return (
        direct.join(salted, "l_returnflag")
        .select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_salts").cast("bigint").alias("n_salts"),
            F.col("direct_cents").cast("bigint").alias("direct_cents"),
            F.col("salted_cents").cast("bigint").alias("salted_cents"),
            (F.col("direct_cents") == F.col("salted_cents")).alias("match"),
        )
        .orderBy("returnflag")
    )


def q_reorder_interval_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer reorder-interval profile -- the repeat-purchase tempo
    (median and p90 days between a customer's consecutive orders: the
    replenishment clock inventory and CRM both plan against), computed
    as exact type-1 order statistics over integer day gaps.

    Exactness: gaps are integer day diffs from per-customer lag
    windows; the percentiles are order statistics on the bounded
    distinct-gap spine (no interpolation); the mean is one division of
    exact sums.

    Plan: one customer-keyed window shuffle, one (gap) rollup, rank
    lookups on the bounded gap spine."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.select(
            "o_custkey",
            F.datediff(
                F.to_date("o_orderdate"),
                F.to_date(F.lag("o_orderdate").over(w)),
            ).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    per_g = gaps.groupBy("gap").agg(F.count(F.lit(1)).alias("c"))
    # distinct-gap spine is data-derived: range-partitioned cumsum
    from pgsf_spark.operators.ranking import global_cumsum

    cum = global_cumsum(
        per_g, [F.col("gap").asc()], {"cum": (F.col("c"), True)}
    ).select("gap", "cum")
    tot = gaps.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap").alias("s"),
        F.max("gap").alias("mx"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    agg = j.groupBy("n", "s", "mx").agg(
        F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n").cast("double")), F.col("gap"))
        ).alias("p50"),
        F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(0.9) * F.col("n").cast("double")), F.col("gap"))
        ).alias("p90"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_gaps"),
        F.round(F.col("s").cast("double") / F.col("n").cast("double"), 6).alias(
            "mean_days"
        ),
        F.col("p50").cast("bigint").alias("p50_days"),
        F.col("p90").cast("bigint").alias("p90_days"),
        F.col("mx").cast("bigint").alias("max_days"),
    )


CONC_TOPK = 20


def q_revenue_concentration_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share of the top-CONC_TOPK customers -- the key-account
    concentration number next to the Gini/Theil/HHI curves (those are
    whole-distribution; this is the question sales actually asks: how
    much walks out the door if the top 20 leave?): exact integer cent
    sums, top-k by (revenue, custkey) total order.

    Plan: one customer rollup shuffle; the top-k is a bounded
    TakeOrdered (per-partition top-k reduce, no full sort); the share is
    two exact sums."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    tot = per.agg(
        F.sum("cents").alias("total"), F.count(F.lit(1)).alias("n_customers")
    )
    top = (
        per.orderBy(F.col("cents").desc(), "o_custkey")
        .limit(CONC_TOPK)
        .agg(F.sum("cents").alias("top_cents"), F.count(F.lit(1)).alias("k"))
    )
    return top.crossJoin(F.broadcast(tot)).select(
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.col("k").cast("bigint").alias("k"),
        F.round(F.col("top_cents").cast("double") / F.lit(100.0), 2).alias(
            "top_revenue_usd"
        ),
        F.round(
            F.col("top_cents").cast("double") / F.col("total").cast("double"), 6
        ).alias("top_share"),
    )


def q_price_variance_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA decomposition of part retail price by brand --
    does BRAND explain catalog pricing (eta^2 = SSB/SST), the
    fixed-effects companion to the time-series seasonality ANOVA:
    between/within sums of squares from exact per-brand cent moments,
    with the F statistic.

    Exactness: per-brand counts/sums/square-sums are exact integers
    (cents, DECIMAL(38,0)); SSB/SSW/eta^2/F are fixed double chains on
    those aggregates with try_divide degeneracy guards.

    Plan: one part rollup keyed on brand (tiny), 25-row algebra."""
    p = load_table(spark, sf_dir, "part")
    dec = "decimal(38,0)"
    per = p.select(
        "p_brand", F.round(F.col("p_retailprice") * 100).cast("long").alias("c")
    ).groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).alias("q"),
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("g"),
        F.sum("n").alias("nt"),
        F.sum("s").alias("st"),
        F.sum("q").alias("qt"),
    )
    j = per.crossJoin(F.broadcast(tot))
    ssb_term = F.round(
        (F.col("s").cast("double") / F.col("n").cast("double")
         - F.col("st").cast("double") / F.col("nt").cast("double"))
        * (F.col("s").cast("double") / F.col("n").cast("double")
           - F.col("st").cast("double") / F.col("nt").cast("double"))
        * F.col("n").cast("double"),
        6,
    ).cast("decimal(27,6)")
    agg = j.groupBy("g", "nt", "st", "qt").agg(F.sum(ssb_term).alias("ssb"))
    ntd = F.col("nt").cast("double")
    sst = F.col("qt").cast("double") - (
        F.col("st").cast("double") * F.col("st").cast("double")
    ) / ntd
    ssb = F.col("ssb").cast("double")
    ssw = sst - ssb
    gd = F.col("g").cast("double")
    f_stat = F.try_divide(ssb / (gd - F.lit(1.0)), ssw / (ntd - gd))
    return agg.select(
        F.col("g").cast("bigint").alias("n_brands"),
        F.col("nt").cast("bigint").alias("n_parts"),
        F.round(F.try_divide(ssb, sst), 6).alias("eta_squared"),
        F.round(f_stat, 6).alias("f_stat"),
    )


SHIFT_TOP = 10


def q_brand_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest brand revenue-share movers between the first and second
    half of the order history -- the market-share drift panel (a share
    POINT is vanity; the SHIFT is what category management acts on):
    per-brand revenue share in each half (the KS median-day split), top
    SHIFT_TOP absolute changes.

    Exactness: half assignment is the KS split device; per-(brand,
    half) cent sums and half totals are exact integers; shares and the
    delta are fixed double chains rounded to 6; ordering is
    (abs delta desc, brand).

    Plan: one orderkey shuffle join, a broadcast part dim, one
    (brand, half) rollup, bounded 25-brand algebra."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    mid = o.agg(
        F.expr(
            "percentile(datediff(to_date(o_orderdate), '1970-01-01'), 0.5D)"
        ).alias("mid")
    )
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .crossJoin(F.broadcast(mid))
        .select(
            "p_brand",
            (
                F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
                <= F.col("mid")
            ).cast("int").alias("h1"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
        )
    )
    per = rows.groupBy("p_brand").agg(
        F.sum(F.when(F.col("h1") == 1, F.col("c")).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("h1") == 0, F.col("c")).otherwise(0)).alias("c2"),
    )
    tot = per.agg(F.sum("c1").alias("t1"), F.sum("c2").alias("t2"))
    j = per.crossJoin(F.broadcast(tot))
    s1 = F.col("c1").cast("double") / F.col("t1").cast("double")
    s2 = F.col("c2").cast("double") / F.col("t2").cast("double")
    return (
        j.select(
            F.col("p_brand").alias("brand"),
            F.round(s1, 6).alias("share_first_half"),
            F.round(s2, 6).alias("share_second_half"),
            F.round(s2 - s1, 6).alias("share_delta"),
        )
        .orderBy(F.abs(F.col("share_delta")).desc(), "brand")
        .limit(SHIFT_TOP)
    )


def q_discount_impact_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount depth and revenue impact per brand -- the merchandising
    panel (list revenue, discount dollars given back, net revenue, and
    the revenue-weighted effective discount rate; a flat avg(discount)
    over-weights cheap lines, the weighted rate is what finance books):
    every term from exact integer cents x basis-point products.

    Exactness: price cents and discount basis points are exact
    integers; their per-line product accumulates in DECIMAL(38,0) (the
    discount dollars are that sum / 10^4 -- two exact integer scalings);
    the rate is one double division rounded to 6.

    Plan: one lineitem scan with the part dim broadcast, one brand
    rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    dec = "decimal(38,0)"
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    bp = F.round(F.col("l_discount") * 10000).cast("long")
    per = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select("p_brand", cents.alias("c"), bp.alias("d"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("c").alias("gross_cents"),
            F.sum(F.col("c").cast(dec) * F.col("d").cast(dec)).alias("disc_cb"),
        )
    )
    disc_cents = F.col("disc_cb").cast("double") / F.lit(10000.0)
    gross = F.col("gross_cents").cast("double")
    return per.select(
        F.col("p_brand").alias("brand"),
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.round(gross / F.lit(100.0), 2).alias("gross_usd"),
        F.round(disc_cents / F.lit(100.0), 2).alias("discount_usd"),
        F.round((gross - disc_cents) / F.lit(100.0), 2).alias("net_usd"),
        F.round(disc_cents / gross, 6).alias("effective_discount_rate"),
    ).orderBy("brand")


def q_supplier_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-base concentration per supplier nation -- the procurement
    risk panel (an HHI near 1 means one supplier carries the nation's
    whole flow; the geographic version of the corpus source-HHI gate):
    per nation, HHI over its suppliers' revenue shares plus the
    effective supplier count.

    Exactness: per-supplier cent sums are exact; each share^2 term is a
    fixed double chain rounded to 12 and decimal-summed per nation; the
    reciprocal is one division.

    Plan: one lineitem rollup keyed on supplier (supplier dim
    broadcast), one nation rollup over the bounded supplier table."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    per_sup = (
        li.groupBy("l_suppkey")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("c"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
    )
    tot = per_sup.groupBy("s_nationkey").agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("n_suppliers")
    )
    j = per_sup.join(tot, "s_nationkey")
    share = F.col("c").cast("double") / F.col("t").cast("double")
    agg = j.groupBy("s_nationkey", "n_suppliers").agg(
        F.sum(F.round(share * share, 12).cast("decimal(18,12)")).alias("hhi")
    )
    hd = F.col("hhi").cast("double")
    return agg.select(
        F.col("s_nationkey").cast("bigint").alias("nation"),
        F.col("n_suppliers").cast("bigint").alias("n_suppliers"),
        F.round(hd, 6).alias("hhi"),
        F.round(F.try_divide(F.lit(1.0), hd), 6).alias("effective_suppliers"),
    ).orderBy("nation")


def q_basket_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size (lines per order) distribution -- the order-shape
    number everything from picking cost to co-purchase graph density
    keys off: exact order-statistic p50/p90 over the bounded size
    spine, the mean, and the single-line share.

    Exactness: sizes are integer counts; percentiles are rank lookups;
    the two ratios are single rounded divisions.

    Plan: one lineitem rollup keyed on orderkey, one size rollup, rank
    lookups on the bounded size spine."""
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("sz"))
    per_s = sizes.groupBy("sz").agg(F.count(F.lit(1)).alias("c"))
    # distinct-size spine is data-derived: range-partitioned cumsum
    from pgsf_spark.operators.ranking import global_cumsum

    cum = global_cumsum(
        per_s, [F.col("sz").asc()], {"cum": (F.col("c"), True)}
    ).select("sz", "c", "cum")
    tot = sizes.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("sz").alias("s"),
        F.max("sz").alias("mx"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    agg = j.groupBy("n", "s", "mx").agg(
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n").cast("double")),
                F.col("sz"),
            )
        ).alias("p50"),
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(0.9) * F.col("n").cast("double")),
                F.col("sz"),
            )
        ).alias("p90"),
        F.sum(F.when(F.col("sz") == 1, F.col("c")).otherwise(0)).alias("singles"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(F.col("s").cast("double") / F.col("n").cast("double"), 6).alias(
            "mean_lines"
        ),
        F.col("p50").cast("bigint").alias("p50_lines"),
        F.col("p90").cast("bigint").alias("p90_lines"),
        F.col("mx").cast("bigint").alias("max_lines"),
        F.round(
            F.col("singles").cast("double") / F.col("n").cast("double"), 6
        ).alias("single_line_share"),
    )


def q_order_value_iqr_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation order-value quartiles -- the distribution drill-down
    under the global percentile gate (same median everywhere can hide
    wildly different spreads; the IQR is the robust spread the mean/sd
    panel misses): exact type-1 p25/p50/p75 order statistics per
    nation over the integer cent spine.

    Exactness: per-(nation, value) counts are exact; quartiles are rank
    lookups (no interpolation); the IQR is an integer difference.

    Plan: one orders->nation rollup (customer broadcast), cumulative
    windows per nation over the bounded distinct-value spine."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    vals = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            F.col("c_nationkey").alias("nation"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        )
    )
    per_v = vals.groupBy("nation", "v").agg(F.count(F.lit(1)).alias("cn"))
    wc = Window.partitionBy("nation").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_v.select("nation", "v", F.sum("cn").over(wc).alias("cum"))
    tot = vals.groupBy("nation").agg(F.count(F.lit(1)).alias("n"))
    j = cum.join(tot, "nation")

    def qtile(q):
        return F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(q) * F.col("n").cast("double")),
                F.col("v"),
            )
        )

    agg = j.groupBy("nation", "n").agg(
        qtile(0.25).alias("p25"), qtile(0.5).alias("p50"), qtile(0.75).alias("p75")
    )
    return agg.select(
        F.col("nation").cast("bigint").alias("nation"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(F.col("p25").cast("double") / F.lit(100.0), 2).alias("p25_usd"),
        F.round(F.col("p50").cast("double") / F.lit(100.0), 2).alias("p50_usd"),
        F.round(F.col("p75").cast("double") / F.lit(100.0), 2).alias("p75_usd"),
        F.round(
            (F.col("p75") - F.col("p25")).cast("double") / F.lit(100.0), 2
        ).alias("iqr_usd"),
    ).orderBy("nation")


def q_part_sourcing_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part multi-sourcing profile -- the supply-risk histogram (a
    single-sourced part is a shutdown waiting on one supplier; the
    distribution of distinct suppliers per part is the first slide of
    every supply-chain review): parts bucketed by supplier count, with
    the single-sourced share on each row.

    Exactness: distinct-supplier counts are integers from one
    (part, supplier) distinct rollup; shares are single rounded
    divisions.

    Plan: one lineitem distinct shuffle keyed on (part, supplier), one
    part rollup, one bounded histogram."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    per_part = (
        li.distinct()
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    hist = per_part.groupBy("n_suppliers").agg(F.count(F.lit(1)).alias("n_parts"))
    tot = per_part.agg(
        F.count(F.lit(1)).alias("tp"),
        F.sum((F.col("n_suppliers") == 1).cast("long")).alias("singles"),
    )
    j = hist.crossJoin(F.broadcast(tot))
    return (
        j.select(
            F.col("n_suppliers").cast("bigint").alias("n_suppliers"),
            F.col("n_parts").cast("bigint").alias("n_parts"),
            F.round(
                F.col("n_parts").cast("double") / F.col("tp").cast("double"), 6
            ).alias("share"),
            F.round(
                F.col("singles").cast("double") / F.col("tp").cast("double"), 6
            ).alias("single_sourced_share"),
        )
        .orderBy("n_suppliers")
    )


def q_customer_spend_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend drift between halves -- the portfolio-level churn
    signal (what share of repeat customers spend MORE in the second
    half of the history; the customer-grain version of the brand share
    shift): counts of growing / shrinking / one-sided customers over
    the KS median-day split.

    Exactness: per-customer half cent sums are exact; classification is
    integer comparison; shares are rounded divisions.

    Plan: one orders rollup keyed on customer, one 1-row classify
    aggregate."""
    o = load_table(spark, sf_dir, "orders")
    sided = o.crossJoin(
        F.broadcast(
            o.agg(
                F.expr(
                    "percentile(datediff(to_date(o_orderdate), '1970-01-01'), 0.5D)"
                ).alias("mid")
            )
        )
    ).select(
        "o_custkey",
        (
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")) <= F.col("mid")
        ).cast("int").alias("h1"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    per = sided.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("h1") == 1, F.col("c")).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("h1") == 0, F.col("c")).otherwise(0)).alias("c2"),
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(((F.col("c1") > 0) & (F.col("c2") > 0)).cast("long")).alias("both"),
        F.sum(
            ((F.col("c1") > 0) & (F.col("c2") > 0) & (F.col("c2") > F.col("c1"))).cast(
                "long"
            )
        ).alias("growing"),
        F.sum(((F.col("c1") > 0) & (F.col("c2") == 0)).cast("long")).alias(
            "first_half_only"
        ),
        F.sum(((F.col("c1") == 0) & (F.col("c2") > 0)).cast("long")).alias(
            "second_half_only"
        ),
    )
    return agg.select(
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.col("both").cast("bigint").alias("active_both_halves"),
        F.col("growing").cast("bigint").alias("growing"),
        F.col("first_half_only").cast("bigint").alias("first_half_only"),
        F.col("second_half_only").cast("bigint").alias("second_half_only"),
        F.round(
            F.try_divide(
                F.col("growing").cast("double"), F.col("both").cast("double")
            ),
            6,
        ).alias("growing_share"),
    )


def q_above_mean_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-mean revenue concentration -- the sort-free Pareto check
    (what share of revenue sits with customers spending above the mean,
    and how few they are; the exact 80/20 curve needs a global sort,
    this threshold form needs only two passes and scales anywhere):
    counts and cent sums above/below the grand-mean spend.

    Exactness: per-customer cent sums are integers; the mean threshold
    compare is cents*n > total (all-integer, no division); shares are
    rounded divisions of exact sums.

    Plan: one customer rollup, one broadcast total, one 1-row
    aggregate."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    tot = per.agg(F.sum("cents").alias("total"), F.count(F.lit(1)).alias("n"))
    j = per.crossJoin(F.broadcast(tot))
    above = (F.col("cents") * F.col("n")) > F.col("total")
    agg = j.agg(
        F.max("n").alias("n_customers"),
        F.max("total").alias("total"),
        F.sum(above.cast("long")).alias("n_above"),
        F.sum(F.when(above, F.col("cents")).otherwise(0)).alias("cents_above"),
    )
    return agg.select(
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.col("n_above").cast("bigint").alias("n_above_mean"),
        F.round(
            F.col("n_above").cast("double") / F.col("n_customers").cast("double"), 6
        ).alias("customer_share"),
        F.round(
            F.col("cents_above").cast("double") / F.col("total").cast("double"), 6
        ).alias("revenue_share"),
    )

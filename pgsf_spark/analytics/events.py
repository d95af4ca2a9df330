"""Event-stream analytics (events table): watermark filters, time bucketing,
latest-per-key, sessionization -- the batch faces of the streaming operators
(SURVEY §2.8). All emitted timestamps are formatted strings for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pgsf_spark.analytics.oracle_utils import davg, dsum
from pgsf_spark.tables import load_table

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def q_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 incremental predicate: strictly-> against a second-truncated
    watermark; filter pushes to the scan."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") > F.lit("2024-01-15 00:00:00"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total_value"))
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window aggregate (batch face of a streaming windowed agg).
    One shuffle on (hour, event_type) -- at scale the natural partition key."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("hour", F.date_format(F.date_trunc("hour", F.col("ts")), TS_FMT))
        .groupBy("hour", "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total_value"))
    )


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key dedup (SURVEY §2.6) -- the exact window the CDC merge
    uses, exposed as a query."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.date_format("ts", TS_FMT).alias("last_ts"),
        )
    )


def q_event_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar extraction from the JSON props payload, aggregated.

    Uses regexp (identical semantics in DuckDB) rather than engine-specific
    JSON functions; get_json_object is the idiomatic Spark form."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.regexp_extract("props", r"(\d+)", 1).cast("int"))
        .withColumn("bucket", (F.col("k") / 10).cast("int"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), davg(F.col("value")).alias("avg_value"))
    )


def q_json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction with the engines' native JSON functions
    (get_json_object here, json_extract_string in the oracle)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.round(F.sum("k") / F.count("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity profile: conditional aggregation (pivot-lite)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchases"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
        dsum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)).alias("purchase_value"),
    )


def q_events_sliding_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (2h length, 1h slide): every event lands in two
    windows. F.window generates the assignment without a join; the oracle
    unnests the two candidate starts per event."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("window_start"),
            "event_type",
            "n",
        )
    )


def q_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (30-min gap): sessions merge while
    events arrive within the gap. Oracle reproduces it with the lag +
    cumulative-sum rewrite, proving the native operator and the manual
    composition (q_sessionize) agree."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), TS_FMT).alias("session_start"),
            "n_events",
        )
    )


def q_user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per event type, count per user (explicit value
    list, so the output schema is fixed -- the only sane pivot at scale)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): classic lag + cumulative
    sum of session-start flags. Batch face of streaming session windows;
    one shuffle on user_id, all window math in one partition pass."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp").cast("long") - F.lag(F.col("ts").cast("timestamp").cast("long")).over(w)
    sess = (
        ev.withColumn("new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .withColumn("session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
        (F.max(F.col("ts").cast("timestamp").cast("long")) - F.min(F.col("ts").cast("timestamp").cast("long"))).alias("duration_sec"),
    )


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user counts for
    stage k only if the stage-k event happens strictly AFTER their stage-k-1
    entry time (min qualifying ts, the standard product-analytics funnel).

    Plan: three conditional min-aggregations chained by user_id joins -- all
    shuffles share the user_id key, so at scale one partitioning is reused
    (exchange reuse) rather than re-shuffling the events table each step."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t1"))
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.lit("1_view").alias("stage"), F.count(F.lit(1)).alias("users"))
        .unionByName(c.agg(F.lit("2_view_click").alias("stage"), F.count(F.lit(1)).alias("users")))
        .unionByName(p.agg(F.lit("3_view_click_purchase").alias("stage"), F.count(F.lit(1)).alias("users")))
    )


def q_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-activity week, counted in
    each later week they were active. Offsets are exact multiples of 7 days
    (both ends Monday-truncated), so integer-div-7 is lossless.

    Two shuffles (user_id for the cohort min, then cohort/offset agg); the
    distinct-activity relation dedups map-side before either."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("week")).distinct()
    cohort = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        active.join(cohort, "user_id")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("CAST(datediff(week, cohort_week) DIV 7 AS INT)").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("users"))
    )


def q_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence mining: the 10 most common 3-step event-type
    paths across users (lead-window trigrams over each user's timeline).

    One shuffle on user_id for the window; trigram assembly is two leads in
    the same window frame (no self-joins); the count aggregates on a key
    space bounded by |event_types|^3. The top-10 is
    TakeOrderedAndProject. Event-order ties broken by event_id so the
    sequence -- and therefore the hash -- is engine-deterministic."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    path = (
        ev.select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
    )
    return (
        path.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


DEBOUNCE_SECONDS = 300


def q_debounced_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce: collapse repeats of the same (user, event_type) arriving
    within DEBOUNCE_SECONDS of the previously KEPT event -- the classic
    client-retry / double-click cleanup pass.

    Approximated as lag-debounce (gap to the previous RAW event), which is
    exact whenever bursts are shorter than the window -- this keeps the
    operator one window pass (shuffle on user_id only) instead of an
    iterative chain; the true running-anchor form is session_gap_stream's
    state logic (streaming/stateful.py). Reports kept/dropped per type."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    ep = F.unix_micros(F.col("ts").cast("timestamp"))  # exact integer microseconds
    gap = ep - F.lag(ep).over(w)
    flagged = ev.select(
        "event_type",
        F.when(gap.isNull() | (gap > DEBOUNCE_SECONDS * 1_000_000), 1).otherwise(0).alias("keep"),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum("keep").cast("bigint").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum("keep")).cast("bigint").alias("n_debounced"),
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event timeline:
    P(next = e2 | current = e1), the model behind next-action prediction and
    synthetic-session generation.

    One shuffle on user_id for the lead window; the (e1, e2) count then
    aggregates on a key space bounded by |event_types|^2, so the second
    exchange moves a handful of rows no matter the corpus size. The row
    probability divides two exact BIGINT counts (single IEEE division +
    round -- engine-portable). Ties in event order broken by event_id, so
    the transition sequence is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
        )
        .filter(F.col("e2").isNotNull())
        .groupBy("e1", "e2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wtot = Window.partitionBy("e1")
    return pairs.select(
        "e1",
        "e2",
        "n",
        F.round(F.col("n") / F.sum("n").over(wtot), 6).alias("prob"),
    )


def q_hourly_gap_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine gap filling with linear interpolation: the resampling pass
    every time-series feature pipeline needs before a model sees the data.

    Builds the complete hourly spine between the corpus min and max hour
    (sequence + explode from a single agg row), left-joins the observed
    hourly purchase totals, and fills missing hours by linear interpolation
    between the nearest observed neighbors (flat extrapolation at the
    edges). The unpartitioned windows are over the SPINE -- one row per
    hour, bounded by the time range rather than the data volume -- so the
    single-task window is over a dimension-sized relation even at 100 TB of
    raw events; the heavy relation is reduced by a keyed partial-agg
    shuffle first. Interpolation arithmetic is integer epoch-hours plus one
    IEEE divide, rounded -- portable."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.round(dsum(F.col("value")), 4).alias("v"))
    )
    spine = (
        ev.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h"))
    )
    eh = (F.unix_seconds(F.col("h")) / 3600).cast("long")
    joined = spine.join(hourly, "h", "left").withColumn("eh", eh)
    wprev = Window.orderBy("eh").rowsBetween(Window.unboundedPreceding, 0)
    wnext = Window.orderBy("eh").rowsBetween(0, Window.unboundedFollowing)
    obs_eh = F.when(F.col("v").isNotNull(), F.col("eh"))
    filled = (
        joined.withColumn("pv", F.last("v", ignorenulls=True).over(wprev))
        .withColumn("ph", F.last(obs_eh, ignorenulls=True).over(wprev))
        .withColumn("nv", F.first("v", ignorenulls=True).over(wnext))
        .withColumn("nh", F.first(obs_eh, ignorenulls=True).over(wnext))
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.round(
                F.col("pv")
                + (F.col("nv") - F.col("pv"))
                * (F.col("eh") - F.col("ph"))
                / (F.col("nh") - F.col("ph")),
                4,
            )
        )
    )
    return filled.select(
        F.date_format("h", TS_FMT).alias("hour"),
        F.col("v").isNull().alias("interpolated"),
        interp.alias("value"),
    )


DECAY_ANCHOR = "2024-03-01"  # scoring as-of date (after the corpus max ts)
DECAY_HALF_LIFE_DAYS = 7


def q_decayed_user_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score per user.

    score = sum(value * 0.5^weeks_ago) -- the standard recency-weighted
    counter (leaderboards, freshness-weighted sampling priors for
    training-data curation). The decay exponent is an exact integer
    (floor(days/half_life)) and the weight is 1.0 / (1 << k): a bit shift
    and a power-of-two division, both bit-exact in every engine -- no
    libm pow, so the per-row weight is engine-portable and the per-user
    sum accumulates in DECIMAL (oracle_utils contract), making the
    aggregate partitioning-independent. One keyed shuffle with map-side
    partials; the anchor date is a literal, so at 100 TB this composes
    with a watermark filter that prunes fully-decayed partitions at the
    scan."""
    ev = load_table(spark, sf_dir, "events")
    days_ago = F.datediff(F.lit(DECAY_ANCHOR).cast("date"), F.col("ts").cast("date"))
    weeks_ago = F.floor(days_ago / F.lit(DECAY_HALF_LIFE_DAYS)).cast("int")
    ev = ev.withColumn("_weeks_ago", weeks_ago)
    weight = F.lit(1.0) / F.expr("shiftleft(1, _weeks_ago)")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(dsum(F.col("value") * weight, "decimal(27,12)"), 6).alias("decayed_score"),
            F.round(dsum(F.col("value")), 2).alias("raw_score"),
        )
        .orderBy("user_id")
    )


ATTRIBUTION_WINDOW_SEC = 1800


def q_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase is credited to the
    user's most recent non-purchase event within ATTRIBUTION_WINDOW_SEC,
    else to 'direct' -- the marketing-analytics pass that turns an event
    stream into channel revenue.

    One window pass per user (shuffle on user_id only): the last preceding
    touch and its timestamp come from two last(ignorenulls) frames ending
    1 ROW BEFORE the purchase (self-excluded), so a purchase can never
    attribute to itself or to a later event; microsecond-exact integer
    timestamps gate the lookback window. The channel rollup then aggregates
    on a key space bounded by |event_types|+1."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ep = F.unix_micros(F.col("ts").cast("timestamp"))
    touch_type = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_ts = F.when(F.col("event_type") != "purchase", ep)
    flagged = ev.select(
        "event_type",
        "value",
        ep.alias("ep"),
        F.last(touch_type, ignorenulls=True).over(w).alias("lt"),
        F.last(touch_ts, ignorenulls=True).over(w).alias("lt_ts"),
    )
    attributed = flagged.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("lt").isNotNull()
            & (F.col("ep") - F.col("lt_ts") <= ATTRIBUTION_WINDOW_SEC * 1_000_000),
            F.col("lt"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel"),
        "value",
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(dsum(F.col("value")), 4).alias("revenue"),
    )


SCD2_OPEN_END = "9999-12-31 00:00:00"  # open interval sentinel (SCD2 convention)


def q_event_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval build (gaps-and-islands): collapse each user's event
    timeline into runs of the same event_type and emit one validity
    interval per run -- the type-2 dimension construction that turns a
    change stream into a point-in-time joinable state table (the reference
    replicates current state only; this derives history alongside it).

    Classic two-window pass, both over the same user_id partitioning (one
    shuffle, exchange reused): a lag() change flag, a running sum to number
    islands, then per-island min(ts) with the next island's start as the
    exclusive end (open intervals get the standard 9999-12-31 sentinel,
    which also keeps the hash null-free). Ties broken by event_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    ).withColumn("island", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    runs = flagged.groupBy("user_id", "island").agg(
        F.min("ts").alias("vf"),
        F.first("event_type").alias("state"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wi = Window.partitionBy("user_id").orderBy("island")
    return runs.select(
        "user_id",
        "state",
        "n_events",
        F.date_format("vf", TS_FMT).alias("valid_from"),
        F.coalesce(
            F.date_format(F.lead("vf").over(wi), TS_FMT), F.lit(SCD2_OPEN_END)
        ).alias("valid_to"),
    )


def q_segment_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience-overlap matrix: for every pair of event-type
    segments, how many users belong to both, with the Jaccard overlap --
    the exact twin of the KMV-sketch estimate (kmv_set_algebra), for the
    scale where exact is still affordable; at 100 TB swap in the sketch
    with the same output shape.

    Plan: the distinct (segment, user) relation self-joins on user_id --
    per-user fan-out is bounded by |segments| (5 here), so the join output
    is |users| * segments^2 at worst, never quadratic in users; marginals
    broadcast back onto the |segments|^2-row pair aggregate."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("event_type", "user_id").distinct()
    a = u.select(F.col("event_type").alias("seg_a"), "user_id")
    b = u.select(F.col("event_type").alias("seg_b"), "user_id")
    both = (
        a.join(b, "user_id")
        .filter(F.col("seg_a") < F.col("seg_b"))
        .groupBy("seg_a", "seg_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    marg = u.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    ma = marg.select(F.col("event_type").alias("seg_a"), F.col("n_users").alias("n_a"))
    mb = marg.select(F.col("event_type").alias("seg_b"), F.col("n_users").alias("n_b"))
    return (
        both.join(F.broadcast(ma), "seg_a")
        .join(F.broadcast(mb), "seg_b")
        .select(
            "seg_a",
            "seg_b",
            "n_a",
            "n_b",
            "n_both",
            F.round(
                F.col("n_both") / (F.col("n_a") + F.col("n_b") - F.col("n_both")), 6
            ).alias("jaccard"),
        )
    )


def q_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / stickiness: daily active users, trailing-7-day active
    users, and their ratio (the DAU/WAU "stickiness" product metric), for
    every day in the corpus range.

    Exact rolling DISTINCT cannot be windowed (distinct doesn't decompose
    over frames), so WAU is the day-spine range join against the distinct
    (day, user) relation -- each activity row lands in at most 7 spine
    days, so the join output is 7x the activity relation, linear not
    quadratic. At 100 TB the same query runs on per-day HLL sketches
    merged over the 7-day window (hll_portable is the primitive); this
    exact form is its small-scale oracle twin."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id").distinct()
    spine = (
        ev.agg(
            F.date_trunc("day", F.min("ts")).alias("lo"),
            F.date_trunc("day", F.max("ts")).alias("hi"),
        )
        .select(F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d"))
    )
    dau = active.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    wau = (
        spine.join(
            active,
            (F.col("day") <= F.col("d")) & (F.col("day") >= F.col("d") - F.expr("interval 6 days")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        wau.join(dau, F.col("d") == F.col("day"), "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.coalesce("dau", F.lit(0)).alias("dau"),
            "wau",
            F.round(F.coalesce("dau", F.lit(0)) / F.col("wau"), 6).alias("stickiness"),
        )
    )


def q_pit_state_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store point-in-time correctness: revenue attributed to the
    behavioral state the user was IN when each purchase happened. State =
    SCD2 intervals derived from the non-purchase stream (same
    gaps-and-islands pass as q_event_state_intervals); each purchase is
    joined to the single interval containing its timestamp -- the PIT join
    that prevents feature leakage in training-set assembly (joining
    tomorrow's state onto today's label is the classic bug this op exists
    to avoid).

    Plan: both windows and the final join share the user_id partitioning,
    so one exchange is reused end to end; the containment predicate rides
    on the user_id equi-join (per-user interval counts are small and
    non-overlapping by construction -- no range-bucket expansion needed;
    for keyless interval joins use operators/rangejoin.py)."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = s.select(
        "user_id", "event_type", "ts", "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0).alias("chg"),
    ).withColumn("island", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    runs = flagged.groupBy("user_id", "island").agg(
        F.min("ts").alias("vf"), F.min("event_type").alias("state")
    )
    wi = Window.partitionBy("user_id").orderBy("island")
    iv = runs.select("user_id", "state", "vf", F.lead("vf").over(wi).alias("vt"))
    p = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = p.join(iv, "user_id").filter(
        (F.col("ts") >= F.col("vf")) & (F.col("vt").isNull() | (F.col("ts") < F.col("vt")))
    )
    return joined.groupBy("state").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.countDistinct("user_id").alias("n_users"),
        dsum(F.col("value")).alias("revenue"),
    )


def q_conversion_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival analysis of view -> purchase conversion: the Nelson-Aalen
    cumulative hazard H(t) = sum_{s<=t} d_s / n_s over event-day index,
    with the risk set n_t = users who have entered (first view <= t) and
    not yet converted before t. Kaplan-Meier's PRODUCT form cannot be made
    hash-exact across engines (libm ln/exp), but the hazard SUM can: the
    cumulative window is ordered by day, so both engines fold the same
    doubles left-to-right -- the _dot_sql determinism trick applied to a
    running sum.

    Plan: two keyed aggregates build per-user (entry, conversion) days;
    two day-grain count series + running sums derive d_t and n_t with no
    per-day joins against users; the windows ride the bounded calendar
    series. Censoring (users who never convert) is handled by n_t simply
    never shrinking for them."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("vday"))
        .join(
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.min(F.to_date("ts")).alias("pday")),
            "user_id",
            "left",
        )
        # conversion counts only when it follows entry (funnel semantics)
        .withColumn("cday", F.when(F.col("pday") >= F.col("vday"), F.col("pday")))
    )
    entries = per_user.groupBy(F.col("vday").alias("day")).agg(
        F.count(F.lit(1)).alias("n_enter")
    )
    convs = per_user.filter(F.col("cday").isNotNull()).groupBy(
        F.col("cday").alias("day")
    ).agg(F.count(F.lit(1)).alias("d"))
    days = entries.join(convs, "day", "full").select(
        "day",
        F.coalesce("n_enter", F.lit(0)).alias("n_enter"),
        F.coalesce("d", F.lit(0)).alias("d"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wprev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        days.withColumn("cum_enter", F.sum("n_enter").over(w))
        .withColumn("cum_conv_before", F.coalesce(F.sum("d").over(wprev), F.lit(0)))
        .withColumn("n_risk", F.col("cum_enter") - F.col("cum_conv_before"))
    )
    hz = risk.withColumn(
        "h",
        F.when(F.col("n_risk") > 0, F.col("d").cast("double") / F.col("n_risk")).otherwise(
            F.lit(0.0)
        ),
    ).withColumn("H", F.sum("h").over(w))
    return hz.filter(F.col("d") > 0).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "d",
        "n_risk",
        F.round("H", 6).alias("cum_hazard"),
    )


def _ab_arm(user_col):
    """md5-parity A/B assignment (the deterministic bucketing service);
    SHARED by q_ab_test_zscore and q_ab_cuped_gate -- the two gates'
    arms must stay bit-identical for t_raw to be comparable."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("ab1:"), user_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.when(h % 2 == 0, "A").otherwise("B")


def q_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t on a hash-randomized A/B split: users are assigned by md5
    parity (the deterministic 'bucketing service' every experimentation
    platform runs) and the metric is per-user purchase spend. Moments
    accumulate in DECIMAL (order-exact) and the statistic is assembled in
    one fixed op sequence, so the doubles are engine-identical. The
    expected |t| on this null split is small; the gate locks the whole
    assignment-measure-test pipeline, not a significant result. (A
    two-proportion z on conversion is degenerate here -- every synthetic
    user converts, pooled variance 0 -- which is itself the classic
    experimentation-pipeline bug this formulation avoids.)

    One groupBy(user_id) builds the metric; the test aggregates 2 arms.
    At 100 TB the per-user aggregate is the only data-sized shuffle."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(27,6)"
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).cast(dec)),
                F.lit(0).cast(dec),
            ).alias("spend")
        )
        .withColumn("arm", _ab_arm(F.col("user_id")))
    )
    sq = F.col("spend").cast("decimal(18,6)")
    g = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("spend").cast("double").alias("s1"),
        F.sum(sq * sq).cast("double").alias("s2"),
    )
    a = g.filter(F.col("arm") == "A").select(
        F.col("n").alias("na"), F.col("s1").alias("sa"), F.col("s2").alias("qa")
    )
    b = g.filter(F.col("arm") == "B").select(
        F.col("n").alias("nb"), F.col("s1").alias("sb"), F.col("s2").alias("qb")
    )
    j = a.crossJoin(b)
    ma = F.col("sa") / F.col("na")
    mb = F.col("sb") / F.col("nb")
    va = (F.col("qa") - F.col("sa") * F.col("sa") / F.col("na")) / (F.col("na") - 1)
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / F.col("nb")) / (F.col("nb") - 1)
    t = (ma - mb) / F.sqrt(va / F.col("na") + vb / F.col("nb"))
    return j.select(
        "na",
        "nb",
        F.round(ma, 4).alias("mean_a"),
        F.round(mb, 4).alias("mean_b"),
        F.round(va, 4).alias("var_a"),
        F.round(vb, 4).alias("var_b"),
        F.round(t, 4).alias("t_welch"),
    )


def q_ab_cuped_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction on the A/B spend test: per-user PRE-period
    spend (before the median event day) is the covariate; theta =
    cov(pre, post) / var(pre) from decimal-exact moments; the adjusted
    metric post - theta * (pre - mean_pre) re-runs Welch's t. The gate
    reports theta, both t statistics and the variance-reduction ratio --
    the numbers an experimentation platform quotes when it claims CUPED
    'cuts required sample size by X%'.

    Every scalar (split day, theta, mean_pre) is a 1-row crossJoin
    broadcast; the only data-sized shuffle is the per-user aggregate, and
    every downstream moment is decimal-accumulated then folded in a fixed
    double op sequence -- hash-exact like the plain Welch gate."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(27,6)"
    dayi = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    base = ev.select(
        "user_id",
        dayi.alias("dayi"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pv"),
    )
    split = base.agg(F.expr("percentile(dayi, 0.5D)").alias("mid"))
    per_user = (
        base.crossJoin(split)
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("dayi") <= F.col("mid"), F.col("pv")).cast(dec)), F.lit(0).cast(dec)
            ).alias("pre"),
            F.coalesce(
                F.sum(F.when(F.col("dayi") > F.col("mid"), F.col("pv")).cast(dec)), F.lit(0).cast(dec)
            ).alias("post"),
        )
        .withColumn("arm", _ab_arm(F.col("user_id")))
        .localCheckpoint()
    )
    pre6 = F.col("pre").cast("decimal(18,6)")
    post6 = F.col("post").cast("decimal(18,6)")
    gm = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre").cast("double").alias("sx"),
        F.sum("post").cast("double").alias("sy"),
        F.sum(pre6 * pre6).cast("double").alias("sxx"),
        F.sum(pre6 * post6).cast("double").alias("sxy"),
    )
    theta_df = gm.select(
        ((F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
         / (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))).alias("theta"),
        (F.col("sx") / F.col("n")).alias("mean_pre"),
    )
    adj = per_user.crossJoin(theta_df).select(
        "arm",
        "post",
        (
            F.col("post").cast("double")
            - F.col("theta") * (F.col("pre").cast("double") - F.col("mean_pre"))
        ).alias("adj"),
    )
    dec2 = "decimal(38,10)"
    g = adj.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("post").cast(dec)).cast("double").alias("sy"),
        F.sum(F.col("post").cast("decimal(18,6)") * F.col("post").cast("decimal(18,6)"))
        .cast("double")
        .alias("syy"),
        F.sum(F.col("adj").cast(dec2)).cast("double").alias("sa"),
        F.sum((F.col("adj") * F.col("adj")).cast(dec2)).cast("double").alias("saa"),
    )

    def side(tag, arm):
        return g.filter(F.col("arm") == arm).select(
            *[F.col(c).alias(f"{c}_{tag}") for c in ("n", "sy", "syy", "sa", "saa")]
        )

    j = side("a", "A").crossJoin(side("b", "B"))

    def var(s, q, n):
        return (q - s * s / n) / (n - 1)

    def welch(sa, sb, va, vb, na, nb):
        return (sa / na - sb / nb) / F.sqrt(va / na + vb / nb)

    vy_a = var(F.col("sy_a"), F.col("syy_a"), F.col("n_a"))
    vy_b = var(F.col("sy_b"), F.col("syy_b"), F.col("n_b"))
    va_a = var(F.col("sa_a"), F.col("saa_a"), F.col("n_a"))
    va_b = var(F.col("sa_b"), F.col("saa_b"), F.col("n_b"))
    return j.crossJoin(theta_df).select(
        F.col("n_a").alias("na"),
        F.col("n_b").alias("nb"),
        F.round("theta", 6).alias("theta"),
        F.round(welch(F.col("sy_a"), F.col("sy_b"), vy_a, vy_b, F.col("n_a"), F.col("n_b")), 4).alias("t_raw"),
        F.round(welch(F.col("sa_a"), F.col("sa_b"), va_a, va_b, F.col("n_a"), F.col("n_b")), 4).alias("t_cuped"),
        F.round((va_a + va_b) / (vy_a + vy_b), 6).alias("var_ratio"),
    )


MS_ITERS = 12  # power-iteration rounds (5-state chain mixes in far fewer)


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the first-order event Markov chain: where
    user sessions spend their time in the long run -- the summary number on
    top of q_event_transitions' matrix (used for dwell-share dashboards and
    as the background distribution for next-action lift). MS_ITERS
    power-iteration rounds from the uniform vector, the same unrolled
    iterative template as pagerank/kmeans.

    Plan: the transition matrix is |event_types|^2 rows (25 here) after ONE
    user_id-shuffle of the event log; every subsequent round is a join +
    aggregate over that tiny relation -- the corpus is touched exactly
    once no matter the iteration count. Contributions accumulate in exact
    DECIMAL per round (the pagerank device), so the unrolled DuckDB CTEs
    hash-match bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
        )
        .filter(F.col("e2").isNotNull())
        .groupBy("e1", "e2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("e1").agg(F.sum("n").alias("tot"))
    trans = pairs.join(tot, "e1").localCheckpoint(eager=True)  # 25 rows
    states = trans.select(F.col("e1").alias("e")).distinct()
    n_states = max(states.count(), 1)  # tiny scalar, same literal the oracle
    # derives; floor of 1 so an empty chain yields an empty result, not a
    # driver-side ZeroDivisionError
    p = states.select("e", F.lit(1.0 / n_states).alias("pr"))
    for _ in range(MS_ITERS):
        p = (
            trans.join(
                p.withColumnRenamed("e", "e1").withColumnRenamed("pr", "pr1"), "e1"
            )
            .groupBy(F.col("e2").alias("e"))
            .agg(
                F.sum(
                    (F.col("pr1") * F.col("n") / F.col("tot")).cast("decimal(27,18)")
                )
                .cast("double")
                .alias("pr")
            )
        )
    return p.select(
        F.col("e").alias("event_type"), F.round("pr", 10).alias("stationary_p")
    ).orderBy("event_type")


# SPRT constants: H0 p=0.18 vs H1 p=0.22, alpha = beta = 0.05. The log
# terms are PYTHON-ROUNDED LITERALS shared verbatim by both query faces, so
# no engine libm enters the statistic at all.
SPRT_L1 = 0.200670695462  # ln(p1/p0), rounded 12
SPRT_L2 = -0.050010420575  # ln((1-p1)/(1-p0)), rounded 12
SPRT_A = 2.944438979166  # ln((1-beta)/alpha) = ln(19)


def q_sprt_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test on arm B's daily conversion
    rate: the experimentation design that PEEKS EVERY DAY without inflating
    false positives (fixed-horizon tests like q_ab_test_zscore forbid
    peeking; SPRT is built for it). Daily log-likelihood-ratio increments
    llr_t = x_t*ln(p1/p0) + (n_t - x_t)*ln(q1/q0) accumulate until the
    Wald boundaries +/-ln(19) are crossed.

    Portability: x/n are integer daily counts, the two log factors are
    shared rounded literals, and the cumulative sum runs over the
    calendar-ordered day series (fixed order -> identical double sequence
    in both engines). Plan: one keyed shuffle builds the daily rollup;
    the cumsum window and boundary scan run on calendar-bounded rows."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.withColumn("arm", _ab_arm(F.col("user_id"))).filter(F.col("arm") == "B")
    daily = b.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("bigint")).alias("x"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.withColumn(
        "llr",
        F.round(
            F.sum(
                (
                    F.col("x") * F.lit(SPRT_L1)
                    + (F.col("n") - F.col("x")) * F.lit(SPRT_L2)
                ).cast("decimal(38,12)")
            ).over(w).cast("double"),
            8,
        ),
    )
    # single-row aggregates even when no boundary is ever crossed (a global
    # agg over an empty relation still yields one NULL row)
    crossed = cum.filter(
        (F.col("llr") >= SPRT_A) | (F.col("llr") <= -SPRT_A)
    ).agg(
        F.min("day").alias("cross_day"),
        F.min_by("llr", "day").alias("llr_at_cross"),
    )
    final = cum.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max_by("llr", "day").alias("llr_final"),
    )
    return (
        final.crossJoin(F.broadcast(crossed))
        .select(
            "n_days",
            F.coalesce(F.date_format("cross_day", "yyyy-MM-dd"), F.lit("none")).alias(
                "decision_day"
            ),
            F.when(F.col("llr_at_cross") >= SPRT_A, "accept_h1")
            .when(F.col("llr_at_cross") <= -SPRT_A, "accept_h0")
            .otherwise("continue")
            .alias("decision"),
            "llr_final",
        )
    )


LATE_WATERMARK_MIN = 30  # the streaming watermark this audit sizes


def q_late_arrival_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-sizing audit: replay each user's event stream in ARRIVAL
    order (event_id is the ingest sequence) and measure how far behind the
    user's high-water mark each event's EVENT time arrives. Events later
    than LATE_WATERMARK_MIN minutes are the ones a streaming watermark of
    that size would drop -- this batch face tells you what the
    streaming/stateful.py jobs' watermark choice actually costs, per event
    type, before you deploy it.

    One shuffle on user_id (the same keying every stateful streaming
    operator uses); the high-water mark is a running max window, lateness
    a row-local difference. Integer second arithmetic end to end."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tsec = F.col("ts").cast("timestamp").cast("long")
    scored = ev.select(
        "event_type",
        (F.coalesce(F.max(tsec).over(w), tsec) - tsec).alias("late_s"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("late_s") > 0).cast("bigint")).alias("n_out_of_order"),
            F.sum((F.col("late_s") > LATE_WATERMARK_MIN * 60).cast("bigint")).alias(
                "n_dropped_by_watermark"
            ),
            F.max("late_s").alias("max_late_s"),
        )
        .orderBy("event_type")
    )


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: users grouped by first-activity week,
    cumulative purchase revenue tracked by week-age -- the
    revenue-over-time companion of the retention matrix (weekly_retention
    counts WHO came back; this sums WHAT they spent, cumulatively, which
    is the curve an LTV model is fit to).

    Exactness: per-(cohort, age) revenue sums accumulate as
    DECIMAL(27,4) cents before the cumulative window, which runs over the
    bounded cohort x age grid (~weeks^2 rows), not over events. Plan: one
    min-per-user shuffle (first week), one broadcast-joinable user->cohort
    map against the purchase stream, one (cohort, age) aggregate, then
    grid-sized windows."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk"), "value"
    )
    cells = (
        buys.join(first, "user_id")
        .select(
            "cohort_week",
            (F.datediff("wk", "cohort_week") / 7).cast("int").alias("age_week"),
            "value",
        )
        .groupBy("cohort_week", "age_week")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    w = Window.partitionBy("cohort_week").orderBy("age_week").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sizes = first.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("cohort_users"))
    return (
        cells.join(sizes, "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "age_week",
            "cohort_users",
            "n_purchases",
            F.round(F.sum("cents").over(w) / 100.0, 2).alias("cum_revenue_usd"),
            F.round(F.sum("cents").over(w) / F.col("cohort_users") / 100.0, 4).alias(
                "ltv_per_user_usd"
            ),
        )
        .orderBy("cohort_week", "age_week")
    )


TRIGRAM_TOP = 20


def q_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigrams over per-user ordered event sequences --
    behavioral n-gram mining (the text-stack instinct applied to
    clickstreams: which three-step paths dominate, the raw material for
    next-action models and funnel discovery).

    Determinism: sequences order by (ts, event_id) so ties cannot
    reorder; the trigram is two lead() calls over the per-user window --
    one shuffle on user_id, then a (e1,e2,e3) count and a top-K sort on
    (n DESC, path). Windows are per-user (bounded partitions), never
    global."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"), "n")
        .orderBy(F.col("n").desc(), "path")
        .limit(TRIGRAM_TOP)
    )


IPW_SEED = "ipw6"
# deliberately CONFOUNDED assignment: treatment probability depends on the
# customer's ORDER COUNT (a covariate that strongly drives total spend), so
# the naive treated-vs-control difference is badly biased upward and only
# inverse-propensity weighting recovers the (true, by construction) zero
# effect. Slots of 256: heavy customers 192 (e=0.75), light 64 (e=0.25).
IPW_HEAVY_ORDERS = 10
IPW_HEAVY_SLOTS = 192
IPW_LIGHT_SLOTS = 64


def q_ipw_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted treatment effect under KNOWN confounded
    assignment -- the observational-causal gate next to the randomized A/B
    shelf: treatment probability depends on the customer's order count
    (heavy buyers are 3x likelier treated), so the naive treated-vs-
    control spend difference is biased far above the true zero effect;
    the SELF-NORMALIZED (Hajek) IPW estimator
    sum(T*y/e)/sum(T/e) - sum((1-T)*y/(1-e))/sum((1-T)/(1-e)) conditions
    on the known propensity and lands near zero. Hajek, not plain
    Horvitz-Thompson, because HT's variance at small cohorts swamps the
    signal (measured: HT landed 25x further from zero than Hajek on the
    150-customer tier). The audit row shows naive and IPW side by side.

    Determinism: assignment is a seeded md5 slot against the two literal
    thresholds; propensities e = slots/256 are exact binary rationals;
    each weighted term rounds to DECIMAL(28,9) before the sum. One
    customer-grain aggregate, then scalar algebra."""
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    slot = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{IPW_SEED}:"), F.col("o_custkey").cast("string"))), 1, 2
        ),
        16,
        10,
    ).cast("int")
    slots = F.when(
        F.col("n_orders") >= IPW_HEAVY_ORDERS, F.lit(IPW_HEAVY_SLOTS)
    ).otherwise(F.lit(IPW_LIGHT_SLOTS))
    base = spend.select(
        "cents",
        (slot < slots).cast("int").alias("t"),
        (slots / F.lit(256.0)).alias("e"),
    )
    yt = F.round(F.col("t") * F.col("cents") / F.col("e"), 9).cast("decimal(28,9)")
    yc = F.round((1 - F.col("t")) * F.col("cents") / (1 - F.col("e")), 9).cast("decimal(28,9)")
    wt = F.round(F.col("t") / F.col("e"), 9).cast("decimal(28,9)")
    wc = F.round((1 - F.col("t")) / (1 - F.col("e")), 9).cast("decimal(28,9)")
    g = base.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("t").cast("bigint").alias("n_treated"),
        F.sum(F.when(F.col("t") == 1, F.col("cents")).otherwise(F.lit(0))).alias("st"),
        F.sum(F.when(F.col("t") == 0, F.col("cents")).otherwise(F.lit(0))).alias("sc"),
        F.sum(yt).cast("double").alias("swt"),
        F.sum(yc).cast("double").alias("swc"),
        F.sum(wt).cast("double").alias("nwt"),
        F.sum(wc).cast("double").alias("nwc"),
    )
    naive = (
        F.col("st").cast("double") / F.col("n_treated")
        - F.col("sc").cast("double") / (F.col("n_users") - F.col("n_treated"))
    )
    ipw = F.col("swt") / F.col("nwt") - F.col("swc") / F.col("nwc")
    return g.select(
        "n_users",
        "n_treated",
        F.round(naive / 100.0, 4).alias("naive_diff_usd"),
        F.round(ipw / 100.0, 4).alias("ipw_ate_usd"),
    )


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival of view -> purchase conversion
    -- the curve itself, completing q_conversion_hazard (whose docstring
    notes the PRODUCT form isn't naively hash-exact across engines):
    S(t) = prod_{s<=t}(1 - d_s/n_s) is carried in LOG space, with each
    day's ln(1 - d/n) rounded to DECIMAL(18,9) before the cumulative sum
    -- the house ln-portability device (Adamic-Adar, DSIR), which turns
    the libm-unsafe running product into an exactly-accumulated sum. The
    gate emits km_log_survival; consumers exponentiate (libm exp is
    deliberately NOT in the gated columns, per the classifier's
    softsign-not-exp precedent).

    Same risk-set construction and plan as the hazard: two keyed
    aggregates to per-user (entry, conversion) days, day-grain count
    series, calendar-bounded windows. A day where the whole risk set
    converts (d = n) has no finite log factor; its row carries NULL and
    the curve is undefined past extinction (documented, unreachable on
    ongoing-entry data)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("vday"))
        .join(
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.min(F.to_date("ts")).alias("pday")),
            "user_id",
            "left",
        )
        .withColumn("cday", F.when(F.col("pday") >= F.col("vday"), F.col("pday")))
    )
    entries = per_user.groupBy(F.col("vday").alias("day")).agg(
        F.count(F.lit(1)).alias("n_enter")
    )
    convs = per_user.filter(F.col("cday").isNotNull()).groupBy(
        F.col("cday").alias("day")
    ).agg(F.count(F.lit(1)).alias("d"))
    days = entries.join(convs, "day", "full").select(
        "day",
        F.coalesce("n_enter", F.lit(0)).alias("n_enter"),
        F.coalesce("d", F.lit(0)).alias("d"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wprev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        days.withColumn("cum_enter", F.sum("n_enter").over(w))
        .withColumn("cum_conv_before", F.coalesce(F.sum("d").over(wprev), F.lit(0)))
        .withColumn("n_risk", F.col("cum_enter") - F.col("cum_conv_before"))
    )
    lnf = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.round(F.log(1.0 - F.col("d") / F.col("n_risk")), 9),
    ).cast("decimal(18,9)")
    curve = risk.withColumn("lnf", lnf).withColumn(
        "km_log", F.sum("lnf").over(w)
    )
    return (
        curve.filter(F.col("d") > 0)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "d",
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.round(F.col("km_log").cast("double"), 8).alias("km_log_survival"),
        )
        .orderBy("day")
    )


def q_log_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test comparing the view -> purchase conversion curves of
    the two md5-parity A/B arms -- the hypothesis test that goes WITH the
    Kaplan-Meier curve (KM draws the survival difference, log-rank says
    whether it is noise): at each conversion day t, arm A's expected
    conversions under H0 are e_t = d_t * nA_t / n_t and the variance is
    the hypergeometric v_t = d_t (nA_t/n_t)(nB_t/n_t)(n_t-d_t)/(n_t-1);
    chi2 = (O_A - E_A)^2 / V.  On this null (hash-randomized) split the
    expected chi2 is ~1 -- like ab_test_zscore, the gate locks the
    assignment-measure-test pipeline, not a significant result.

    Exactness: risk sets and conversion counts are integers from the same
    per-user min-day construction as q_kaplan_meier; each day's e_t and
    v_t are a FIXED left-to-right chain of double ops on those integers
    (identical IEEE sequence both engines), rounded to 9 and
    decimal-summed, so E_A and V are order-independent.  chi2 is assembled
    from the three exact sums; try_divide makes a degenerate V (all
    conversions on one day with n=1) NULL on both faces.

    Plan: two keyed aggregates to per-user (entry, conversion) days, one
    day-grain rollup per series, calendar-bounded cumulative windows over
    the ~2.4k-row day spine (single-partition by design, like every stat
    on this shelf), one scalar aggregate."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("vday"))
        .join(
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.min(F.to_date("ts")).alias("pday")),
            "user_id",
            "left",
        )
        .withColumn("cday", F.when(F.col("pday") >= F.col("vday"), F.col("pday")))
        .withColumn("arm", _ab_arm(F.col("user_id")))
    )
    a = (F.col("arm") == "A").cast("long")
    b = (F.col("arm") == "B").cast("long")
    entries = per_user.groupBy(F.col("vday").alias("day")).agg(
        F.sum(a).alias("ea"), F.sum(b).alias("eb")
    )
    convs = per_user.filter(F.col("cday").isNotNull()).groupBy(
        F.col("cday").alias("day")
    ).agg(F.sum(a).alias("da"), F.sum(b).alias("db"))
    days = entries.join(convs, "day", "full").select(
        "day",
        *[F.coalesce(c, F.lit(0)).alias(c) for c in ("ea", "eb", "da", "db")],
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wprev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        days.withColumn(
            "na",
            F.sum("ea").over(w) - F.coalesce(F.sum("da").over(wprev), F.lit(0)),
        )
        .withColumn(
            "nb",
            F.sum("eb").over(w) - F.coalesce(F.sum("db").over(wprev), F.lit(0)),
        )
        .withColumn("d", F.col("da") + F.col("db"))
        .withColumn("n", F.col("na") + F.col("nb"))
    )
    dd, na, nb, n = (F.col(c).cast("double") for c in ("d", "na", "nb", "n"))
    et = F.round(dd * na / n, 9)
    vt = F.round(dd * na / n * nb / n * (n - dd) / (n - F.lit(1.0)), 9)
    terms = risk.filter((F.col("d") > 0) & (F.col("n") > 1)).select(
        "da", et.cast("decimal(18,9)").alias("et"), vt.cast("decimal(18,9)").alias("vt")
    )
    g = terms.agg(
        F.sum("da").cast("bigint").alias("observed_a"),
        F.sum("et").cast("double").alias("expected_a"),
        F.sum("vt").cast("double").alias("variance"),
    )
    diff = F.col("observed_a").cast("double") - F.col("expected_a")
    return g.select(
        "observed_a",
        F.round("expected_a", 6).alias("expected_a"),
        F.round("variance", 6).alias("variance"),
        F.round(F.try_divide(diff * diff, F.col("variance")), 6).alias("chi_square"),
    )


OBF_K = 5  # weekly interim looks
OBF_Z_FINAL = 1.959964  # Phi^-1(0.975): the fixed-horizon two-sided bound


def _obf_boundaries() -> list[float]:
    """O'Brien-Fleming z boundaries z_k = z_final * sqrt(K/k) for look
    k = 1..K -- very conservative early, converging to the fixed-horizon
    bound at the last look.  Pure python constants embedded identically in
    both faces (the _bh_thresholds device: no erf/exp in gated columns)."""
    import math

    return [round(OBF_Z_FINAL * math.sqrt(OBF_K / k), 6) for k in range(1, OBF_K + 1)]


def q_obrien_fleming_looks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential monitoring of the A/B spend experiment: OBF_K
    weekly interim looks, each re-running Welch's z on the data
    accumulated SO FAR, against the O'Brien-Fleming spending boundaries
    -- the peeking-correct version of q_ab_test_zscore (an experimenter
    who reads the dashboard weekly at a flat 1.96 inflates false
    positives ~3x; OBF prices the five looks so the family-wise rate
    stays at alpha).  On this null split no look should cross.

    Exactness: per-(look, arm) moments accumulate in DECIMAL over the
    cumulative event sets (a user joins look k iff their first event
    falls in weeks 1..k); z is the same fixed Welch chain as
    q_ab_test_zscore; boundaries are python literals; try_divide makes a
    one-user arm NULL on both faces.

    Plan: one groupBy(user, week) aggregate, a bounded x OBF_K explode to
    looks, one (look, arm) rollup -- the cumulative re-aggregation is
    keyed, never windowed over data."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(27,6)"
    mind = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    # explicit floor division: DuckDB CAST(double AS INT) ROUNDS while a
    # Spark int cast truncates -- // on both faces sidesteps the class
    week = F.floor(F.datediff(F.to_date("ts"), F.col("d0")) / 7).cast("int") + 1
    uw = (
        ev.crossJoin(F.broadcast(mind))
        .withColumn("week", week)
        .filter(F.col("week") <= OBF_K)
        .groupBy("user_id", "week")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).cast(dec)),
                F.lit(0).cast(dec),
            ).alias("spend")
        )
        .withColumn("arm", _ab_arm(F.col("user_id")))
    )
    per_look = (
        uw.select(
            "user_id", "arm", "spend", F.explode(F.sequence(F.col("week"), F.lit(OBF_K))).alias("look")
        )
        .groupBy("look", "user_id", "arm")
        .agg(F.sum("spend").alias("spend"))
    )
    sq = F.col("spend").cast("decimal(18,6)")
    g = per_look.groupBy("look", "arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("spend").cast("double").alias("s1"),
        F.sum(sq * sq).cast("double").alias("s2"),
    )
    a = g.filter(F.col("arm") == "A").select(
        "look", F.col("n").alias("na"), F.col("s1").alias("sa"), F.col("s2").alias("qa")
    )
    b = g.filter(F.col("arm") == "B").select(
        "look", F.col("n").alias("nb"), F.col("s1").alias("sb"), F.col("s2").alias("qb")
    )
    j = a.join(b, "look")
    ma = F.col("sa") / F.col("na")
    mb = F.col("sb") / F.col("nb")
    va = F.try_divide(
        F.col("qa") - F.col("sa") * F.col("sa") / F.col("na"), F.col("na") - 1
    )
    vb = F.try_divide(
        F.col("qb") - F.col("sb") * F.col("sb") / F.col("nb"), F.col("nb") - 1
    )
    z = F.round(F.try_divide(ma - mb, F.sqrt(va / F.col("na") + vb / F.col("nb"))), 6)
    bound = F.element_at(F.array(*[F.lit(t) for t in _obf_boundaries()]), F.col("look"))
    return (
        j.select(
            F.col("look").cast("int").alias("look"),
            F.col("na").cast("bigint").alias("na"),
            F.col("nb").cast("bigint").alias("nb"),
            z.alias("z"),
            bound.alias("obf_boundary"),
            (F.abs(z) >= bound).alias("crossed"),
        )
        .orderBy("look")
    )


MK_SEED = "mk7"  # train/eval user split for the Markov next-event gate


def q_markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction accuracy of the first-order Markov model --
    the EVALUATED version of q_event_transitions (that gate emits the
    matrix; this one asks whether the matrix actually predicts): train
    the argmax-next-event table on an md5-parity half of users, score
    top-1 accuracy on the held-out half's transitions, and report the
    lift over always predicting the train split's most common next
    event. Accuracy ~ baseline says sessions are memoryless -- the
    go/no-go a sequence-model investment hangs on.

    Determinism: predictions are (count desc, event asc) argmaxes over
    the <= |event_types|^2 transition table (dimension-sized windows);
    accuracy is one integer ratio.

    Plan: one user-keyed lead window forms transitions; the model is a
    bounded broadcast; eval is one projection + aggregate."""
    ev = load_table(spark, sf_dir, "events")
    split = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{MK_SEED}:"), F.col("user_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            split.alias("split"),
        )
        .filter(F.col("e2").isNotNull())
    )
    train = pairs.filter(F.col("split") == 0).groupBy("e1", "e2").agg(
        F.count(F.lit(1)).alias("c")
    )
    wp = Window.partitionBy("e1").orderBy(F.col("c").desc(), "e2")
    pred = (
        train.withColumn("r", F.row_number().over(wp))
        .filter(F.col("r") == 1)
        .select("e1", F.col("e2").alias("pred_e2"))
    )
    base = (
        train.groupBy("e2")
        .agg(F.sum("c").alias("c"))
        .orderBy(F.col("c").desc(), "e2")
        .limit(1)
        .select(F.col("e2").alias("base_e2"))
    )
    ev_pairs = (
        pairs.filter(F.col("split") == 1)
        .join(F.broadcast(pred), "e1", "left")
        .crossJoin(F.broadcast(base))
    )
    n_train = train.agg(F.sum("c").alias("n")).select(F.col("n").cast("bigint"))
    return (
        ev_pairs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.sum((F.col("e2") == F.col("pred_e2")).cast("long"))
            .cast("bigint")
            .alias("n_correct"),
            F.sum((F.col("e2") == F.col("base_e2")).cast("long"))
            .cast("bigint")
            .alias("n_base_correct"),
        )
        .crossJoin(F.broadcast(n_train.select(F.col("n").alias("n_train"))))
        .select(
            "n_train",
            "n_eval",
            F.round(F.col("n_correct").cast("double") / F.col("n_eval"), 6).alias(
                "accuracy"
            ),
            F.round(
                F.col("n_base_correct").cast("double") / F.col("n_eval"), 6
            ).alias("baseline_accuracy"),
            F.round(
                F.col("n_correct").cast("double") / F.col("n_eval")
                - F.col("n_base_correct").cast("double") / F.col("n_eval"),
                6,
            ).alias("lift"),
        )
    )


def q_overdispersion_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion check on per-user event counts -- the
    one-number modeling gate before anyone fits a Poisson rate to user
    activity (real activity is almost always overdispersed; a dispersion
    index near 1 is what the Poisson assumption REQUIRES): index =
    variance / mean of per-user counts, plus the chi-square dispersion
    statistic sum((x - mean)^2) / mean against its n-1 degrees of
    freedom.

    Exactness: counts are integers; moments accumulate in DECIMAL(38,0);
    the index and statistic are fixed double chains; try_divide makes the
    zero-mean degenerate case NULL on both faces.

    Plan: one groupBy(user) count, one 1-row moment aggregate."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    sq = F.col("c").cast("decimal(19,0)")
    g = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("c").cast("decimal(38,0)")).alias("s1"),
        F.sum(sq * sq).alias("s2"),
    )
    n = F.col("n_users").cast("double")
    mean = F.col("s1").cast("double") / n
    var = F.col("s2").cast("double") / n - mean * mean
    chi = F.try_divide(
        F.col("s2").cast("double") - F.col("s1").cast("double") * mean, mean
    )
    return g.select(
        F.col("n_users").cast("bigint").alias("n_users"),
        F.round(mean, 6).alias("mean_events"),
        F.round(var, 6).alias("var_events"),
        F.round(F.try_divide(var, mean), 6).alias("dispersion_index"),
        F.round(chi, 6).alias("chi_square"),
        (F.col("n_users") - 1).cast("bigint").alias("dof"),
    )


def q_difference_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on the A/B arms across a pre/post period
    split -- the panel-causal gate completing the shelf (randomized:
    ab_test/CUPED/OBF; observational: IPW; panel: this): per-user
    purchase spend in each half of the event window, cell means for
    (arm x period), and DiD = (A_post - A_pre) - (B_post - B_pre),
    which nets out both the arm-level baseline difference and the
    common time trend.  On this null split the estimate is ~0; the gate
    locks the panel construction, not a significant effect.

    Determinism: the period split day is integer arithmetic on the
    min/max event days; per-user-period spends accumulate in DECIMAL and
    zero-fill through an explicit (user x period) grid, so the cell
    means are exact-decimal ratios; DiD is a fixed double chain.

    Plan: one per-(user, period) aggregate, a users x 2 literal grid
    (explode of a 2-element array), one 4-cell rollup."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(27,6)"
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    split_day = F.date_add(
        F.col("d0"), F.floor(F.datediff(F.col("d1"), F.col("d0")) / 2).cast("int")
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "event_type",
        "value",
        (F.to_date("ts") > split_day).cast("int").alias("post"),
    )
    per_up = tagged.groupBy("user_id", "post").agg(
        F.coalesce(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).cast(dec)),
            F.lit(0).cast(dec),
        ).alias("spend")
    )
    users = tagged.select("user_id").distinct().withColumn("arm", _ab_arm(F.col("user_id")))
    grid = users.select(
        "user_id", "arm", F.explode(F.array(F.lit(0), F.lit(1))).alias("post")
    )
    filled = grid.join(per_up, ["user_id", "post"], "left").select(
        "arm",
        "post",
        F.coalesce(F.col("spend"), F.lit(0).cast(dec)).alias("spend"),
    )
    cells = filled.groupBy("arm", "post").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("spend").cast("double") / F.count(F.lit(1))).alias("mean_spend"),
    )
    a_pre = F.max(F.when((F.col("arm") == "A") & (F.col("post") == 0), F.col("mean_spend")))
    a_post = F.max(F.when((F.col("arm") == "A") & (F.col("post") == 1), F.col("mean_spend")))
    b_pre = F.max(F.when((F.col("arm") == "B") & (F.col("post") == 0), F.col("mean_spend")))
    b_post = F.max(F.when((F.col("arm") == "B") & (F.col("post") == 1), F.col("mean_spend")))
    g = cells.agg(
        F.sum("n").cast("bigint").alias("n_user_periods"),
        a_pre.alias("a_pre"),
        a_post.alias("a_post"),
        b_pre.alias("b_pre"),
        b_post.alias("b_post"),
    )
    return g.select(
        "n_user_periods",
        F.round("a_pre", 4).alias("a_pre"),
        F.round("a_post", 4).alias("a_post"),
        F.round("b_pre", 4).alias("b_pre"),
        F.round("b_post", 4).alias("b_post"),
        F.round(
            (F.col("a_post") - F.col("a_pre")) - (F.col("b_post") - F.col("b_pre")), 6
        ).alias("did_estimate"),
    )


def q_wald_iv_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald instrumental-variable estimate with the md5 arm as a
    randomized ENCOURAGEMENT instrument: Z = arm A, D = user clicked at
    least once (the endogenous exposure no one gets to randomize), Y =
    purchase spend.  Wald = (E[Y|Z=1] - E[Y|Z=0]) / (E[D|Z=1] - E[D|Z=0])
    -- the intent-to-treat effect rescaled by the first stage, i.e. the
    LATE for instrument-compliers.  On this null instrument the first
    stage is ~0 and the gate's value is the SHAPE: it reports ITT, first
    stage, and Wald side by side so a weak instrument (tiny first stage
    blowing up the ratio -- NULL here via try_divide when exactly zero)
    is visible instead of silently shipped.

    Determinism: one per-user aggregate (spend in DECIMAL, clicked as a
    max of indicators), arm from the shared md5 parity, two-cell means as
    exact-decimal ratios, fixed double chain after.

    Plan: one groupBy(user), one 2-cell rollup."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(27,6)"
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).cast(dec)),
                F.lit(0).cast(dec),
            ).alias("y"),
            F.max((F.col("event_type") == "click").cast("int")).alias("d"),
        )
        .withColumn("z", (_ab_arm(F.col("user_id")) == "A").cast("int"))
    )
    g = per_user.groupBy("z").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("ybar"),
        (F.sum("d").cast("double") / F.count(F.lit(1))).alias("dbar"),
    )
    z1 = g.filter(F.col("z") == 1).select(
        F.col("n").alias("n1"), F.col("ybar").alias("y1"), F.col("dbar").alias("d1")
    )
    z0 = g.filter(F.col("z") == 0).select(
        F.col("n").alias("n0"), F.col("ybar").alias("y0"), F.col("dbar").alias("d0")
    )
    j = z1.crossJoin(z0)
    itt = F.col("y1") - F.col("y0")
    fs = F.col("d1") - F.col("d0")
    return j.select(
        F.col("n1").cast("bigint").alias("n_encouraged"),
        F.col("n0").cast("bigint").alias("n_control"),
        F.round(itt, 6).alias("itt_effect"),
        F.round(fs, 6).alias("first_stage"),
        F.round(F.try_divide(itt, fs), 6).alias("wald_late"),
    )


RD_CUTOFF_CENTS = 500_000  # acctbal cutoff ($5000) defining treatment
RD_BW_CENTS = 200_000  # local-linear bandwidth ($2000 each side)


def q_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression discontinuity at an account-balance cutoff --
    the threshold-assignment causal design finishing the shelf (RCT,
    CUPED, sequential, IPW, DiD, IV; RD is what's left when assignment
    is a RULE): customers just above/below the $5000 balance line get
    separate local-linear fits of total order spend on the centered
    running variable within a $2000 bandwidth, and the effect is the
    gap between the two intercepts AT the cutoff.  On this synthetic
    data the gap is ~0; the gate locks the local-fit construction.

    Exactness: the running variable and outcome are integer cents; each
    side's five OLS moments accumulate in DECIMAL(38,0) (the
    nation_revenue_ols device) and the intercept/slope are fixed double
    chains; try_divide makes a degenerate side (constant x) NULL.

    Plan: one orders-per-customer aggregate left-joined onto the
    bandwidth-filtered customer scan (customers with no orders count at
    zero spend), one 2-group moment rollup."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
    )
    base = (
        cust.select(
            "c_custkey",
            (F.round(F.col("c_acctbal") * 100).cast("long") - RD_CUTOFF_CENTS).alias("x"),
        )
        .filter((F.col("x") >= -RD_BW_CENTS) & (F.col("x") <= RD_BW_CENTS))
        .join(spend, cust.c_custkey == spend.o_custkey, "left")
        .select(
            "x",
            F.coalesce(F.col("y"), F.lit(0)).alias("y"),
            (F.col("x") >= 0).cast("int").alias("side"),
        )
    )
    dec = "decimal(38,0)"
    xd, yd = F.col("x").cast("decimal(19,0)"), F.col("y").cast("decimal(19,0)")
    g = base.groupBy("side").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(xd * yd).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    den = n * sxx - sx * sx
    fit = g.select(
        "side",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.try_divide(sy * sxx - sx * sxy, den) / 100.0, 4).alias("icpt_usd"),
        F.round(F.try_divide(n * sxy - sx * sy, den), 6).alias("slope"),
    )
    l = fit.filter(F.col("side") == 0).select(
        F.col("n").alias("n_left"),
        F.col("icpt_usd").alias("intercept_left_usd"),
        F.col("slope").alias("slope_left"),
    )
    r = fit.filter(F.col("side") == 1).select(
        F.col("n").alias("n_right"),
        F.col("icpt_usd").alias("intercept_right_usd"),
        F.col("slope").alias("slope_right"),
    )
    return l.crossJoin(r).select(
        "n_left",
        "n_right",
        "intercept_left_usd",
        "intercept_right_usd",
        F.round(
            F.col("intercept_right_usd") - F.col("intercept_left_usd"), 4
        ).alias("rd_effect_usd"),
        "slope_left",
        "slope_right",
    )


LN2 = 0.6931471805599453  # shared literal for the half-life conversion


def q_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-decay fit of the pooled weekly retention curve -- the
    one-number version of q_weekly_retention (that gate emits the cohort
    matrix; this one answers "how fast do users decay?"): pool cohorts
    into rate(age) = active users at week-age / cohort users, fit
    ln(rate) on age by OLS over the positive ages, and report the decay
    slope and half-life = ln 2 / |slope| weeks.

    Exactness: rates are integer ratios; each ln rounds to 9 (the house
    device); the OLS moments accumulate in DECIMAL over (age, rounded-ln)
    terms rounded to 12; slope and half-life are fixed double chains
    against the shared ln-2 literal, with try_divide guarding a flat
    curve.

    Plan: the same two shuffles as weekly_retention (user cohort min,
    cohort/age agg) plus an age-grain rollup -- everything past the
    second shuffle lives on <= max-age rows."""
    ev = load_table(spark, sf_dir, "events")
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    aged = active.join(cohort, "user_id").select(
        F.expr("CAST(datediff(week, cohort_week) DIV 7 AS INT)").alias("age"),
        "user_id",
    )
    base = cohort.agg(F.count(F.lit(1)).alias("n_users"))
    per_age = aged.groupBy("age").agg(F.count(F.lit(1)).alias("active"))
    rates = (
        per_age.crossJoin(F.broadcast(base))
        .filter(F.col("age") >= 1)
        .select(
            "age",
            F.round(
                F.log(F.col("active").cast("double") / F.col("n_users").cast("double")),
                9,
            ).alias("y"),
        )
    )
    dec = "decimal(27,12)"
    x = F.col("age").cast("double")
    g = rates.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.round(x, 12).cast(dec)).alias("sx"),
        F.sum(F.round(F.col("y"), 12).cast(dec)).alias("sy"),
        F.sum(F.round(x * x, 12).cast(dec)).alias("sxx"),
        F.sum(F.round(x * F.col("y"), 12).cast(dec)).alias("sxy"),
    )
    k = F.col("k").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope = F.try_divide(k * sxy - sx * sy, k * sxx - sx * sx)
    return g.select(
        F.col("k").cast("bigint").alias("n_ages"),
        F.round(slope, 6).alias("decay_slope"),
        F.round(F.try_divide(F.lit(LN2), -slope), 6).alias("halflife_weeks"),
    )


SHAP_CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
# |S|!(n-1-|S|)!/n! * 24 for n=4: coalition sizes 0..3 -> 6, 2, 2, 6
SHAP_W24 = [6, 2, 2, 6]


def _popcount4(col):
    """Portable 4-bit popcount (plain arithmetic on both faces -- no
    engine bit_count dependency)."""
    return (
        (col.bitwiseAND(F.lit(1)))
        + (F.shiftright(col, 1).bitwiseAND(F.lit(1)))
        + (F.shiftright(col, 2).bitwiseAND(F.lit(1)))
        + (F.shiftright(col, 3).bitwiseAND(F.lit(1)))
    )


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value conversion attribution over the four
    non-purchase channels -- the game-theoretic split of credit that
    last-touch attribution (q_last_touch_attribution) cannot give
    (Shapley is the unique allocation satisfying efficiency/symmetry/
    dummy): the coalition value v(S) counts converting users whose
    touched-channel set is a SUBSET of S, and
    phi_i = sum_{S not containing i} w(|S|) (v(S+i) - v(S)).

    Exactness: the whole computation is INTEGER until the last step --
    per-user channel masks, per-mask conversion counts, subset-sum
    v(S), and phi*24 with the integer weight table {6,2,2,6} (24 = 4!
    clears the rational Shapley weights); the reported shapley value is
    one double division by 24.0 and the share one more, both rounded.
    Efficiency (sum phi = v(full) - v(empty)) is locked in the
    semantics suite.

    Plan: one events->user shuffle, one 16-row mask rollup; the
    subset-sum and marginal-gain joins run on broadcast 16-row tables
    (bounded-dims device) -- nothing downstream of the first two
    aggregates scales with data."""
    ev = load_table(spark, sf_dir, "events")
    flags = ev.groupBy("user_id").agg(
        *[
            F.max(F.when(F.col("event_type") == c, bit).otherwise(0)).alias(f"b{bit}")
            for c, bit in SHAP_CHANNELS
        ],
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    mask_col = (
        F.col("b1") + F.col("b2") + F.col("b4") + F.col("b8")
    )
    per_mask = flags.select(mask_col.alias("mask"), "conv").groupBy("mask").agg(
        F.sum("conv").alias("conv")
    )
    spine = spark.range(16).select(F.col("id").cast("int").alias("s"))
    v = (
        spine.join(
            F.broadcast(per_mask),
            F.col("s").bitwiseAND(F.col("mask")) == F.col("mask"),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("conv"), F.lit(0)).alias("v"))
    )
    ch = spark.createDataFrame(SHAP_CHANNELS, ["channel", "bit"])
    v2 = v.select(F.col("s").alias("s2"), F.col("v").alias("v_with"))
    w24 = F.element_at(
        F.array(*[F.lit(w) for w in SHAP_W24]), _popcount4(F.col("s")) + 1
    )
    gains = (
        ch.join(F.broadcast(v), F.col("s").bitwiseAND(F.col("bit")) == 0)
        .join(F.broadcast(v2), F.col("s2") == F.col("s") + F.col("bit"))
        .select("channel", (w24 * (F.col("v_with") - F.col("v"))).alias("wgain"))
    )
    phi = gains.groupBy("channel").agg(F.sum("wgain").alias("phi24"))
    tot = phi.agg(F.sum("phi24").alias("t24"))
    return (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.col("phi24").cast("bigint").alias("phi24"),
            F.round(F.col("phi24").cast("double") / F.lit(24.0), 6).alias("shapley"),
            F.round(
                F.try_divide(F.col("phi24").cast("double"), F.col("t24").cast("double")),
                6,
            ).alias("share"),
        )
        .orderBy("channel")
    )


def q_nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of view -> purchase conversion --
    the estimator pair to Kaplan-Meier (KM carries the survival product
    in log space; Nelson-Aalen sums the raw hazard increments d/n
    directly, the better-behaved quantity for small risk sets and the
    natural input to proportional-hazards eyeballing):
    H(t) = sum_{s<=t} d_s/n_s, with the Aalen variance sum d_s/n_s^2.

    Exactness: identical risk-set construction to q_kaplan_meier (two
    keyed user aggregates, day-grain calendar-bounded windows); each
    day's d/n and d/n^2 are single double divisions of exact integers
    rounded to DECIMAL(18,9)/(18,12) BEFORE the cumulative sum, so the
    running totals accumulate exactly on both faces.

    Plan: same as KM -- one events scan, two user-keyed shuffles, then
    the bounded day spine."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("vday"))
        .join(
            ev.filter(F.col("event_type") == "purchase")
            .groupBy("user_id")
            .agg(F.min(F.to_date("ts")).alias("pday")),
            "user_id",
            "left",
        )
        .withColumn("cday", F.when(F.col("pday") >= F.col("vday"), F.col("pday")))
    )
    entries = per_user.groupBy(F.col("vday").alias("day")).agg(
        F.count(F.lit(1)).alias("n_enter")
    )
    convs = per_user.filter(F.col("cday").isNotNull()).groupBy(
        F.col("cday").alias("day")
    ).agg(F.count(F.lit(1)).alias("d"))
    days = entries.join(convs, "day", "full").select(
        "day",
        F.coalesce("n_enter", F.lit(0)).alias("n_enter"),
        F.coalesce("d", F.lit(0)).alias("d"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wprev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        days.withColumn("cum_enter", F.sum("n_enter").over(w))
        .withColumn("cum_conv_before", F.coalesce(F.sum("d").over(wprev), F.lit(0)))
        .withColumn("n_risk", F.col("cum_enter") - F.col("cum_conv_before"))
    )
    nd = F.col("n_risk").cast("double")
    inc = F.when(
        (F.col("d") > 0) & (F.col("n_risk") > 0),
        F.round(F.col("d").cast("double") / nd, 9),
    ).cast("decimal(18,9)")
    vinc = F.when(
        (F.col("d") > 0) & (F.col("n_risk") > 0),
        F.round(F.col("d").cast("double") / (nd * nd), 12),
    ).cast("decimal(18,12)")
    curve = (
        risk.withColumn("inc", inc)
        .withColumn("vinc", vinc)
        .withColumn("h", F.sum("inc").over(w))
        .withColumn("hv", F.sum("vinc").over(w))
    )
    return (
        curve.filter(F.col("d") > 0)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "d",
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.round(F.col("h").cast("double"), 8).alias("cum_hazard"),
            F.round(F.col("hv").cast("double"), 10).alias("hazard_var"),
        )
        .orderBy("day")
    )


def q_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy of the next event given the current one --
    the information-theoretic predictability number on top of
    q_event_transitions' matrix (H(Y|X) in nats: 0 = the next action is
    fully determined, ln(5) = it is uniform noise), reported with the
    marginal next-event entropy H(Y) and Theil's uncertainty coefficient
    U = (H(Y) - H(Y|X)) / H(Y), the normalized "how much does knowing
    the current event help" share.

    Exactness: transition and marginal counts are exact integers from
    ONE user-keyed shuffle; each cell's -(c_xy/N) ln(c_xy/c_x) term is
    a fixed double chain rounded to 12 into DECIMAL before the <= 25-row
    sum (the house sum-order-proof device), likewise the marginal terms;
    U is two rounded-input doubles with try_divide degeneracy.

    Plan: identical to markov_stationary -- one event-log shuffle, then
    bounded |event_types|^2 algebra."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
        )
        .filter(F.col("e2").isNotNull())
        .groupBy("e1", "e2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    row_tot = pairs.groupBy("e1").agg(F.sum("c").alias("cx"))
    col_tot = pairs.groupBy("e2").agg(F.sum("c").alias("cy"))
    tot = pairs.agg(F.sum("c").alias("nt"))
    cell = pairs.join(F.broadcast(row_tot), "e1").crossJoin(F.broadcast(tot))
    term = F.round(
        -(F.col("c").cast("double") / F.col("nt").cast("double"))
        * F.log(F.col("c").cast("double") / F.col("cx").cast("double")),
        12,
    ).cast("decimal(18,12)")
    hyx = cell.agg(F.sum(term).alias("hyx"), F.max("nt").alias("nt"))
    mterm = F.round(
        -(F.col("cy").cast("double") / F.col("nt").cast("double"))
        * F.log(F.col("cy").cast("double") / F.col("nt").cast("double")),
        12,
    ).cast("decimal(18,12)")
    hy = col_tot.crossJoin(F.broadcast(tot)).agg(F.sum(mterm).alias("hy"))
    j = hyx.crossJoin(F.broadcast(hy))
    hyxd = F.col("hyx").cast("double")
    hyd = F.col("hy").cast("double")
    return j.select(
        F.col("nt").cast("bigint").alias("n_transitions"),
        F.round(hyxd, 9).alias("h_next_given_current"),
        F.round(hyd, 9).alias("h_next"),
        F.round(F.try_divide(hyd - hyxd, hyd), 6).alias("uncertainty_coefficient"),
    )


def q_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Barabasi burstiness of per-user inter-event gaps -- the temporal
    texture number for the event stream (B = (sigma - mu)/(sigma + mu):
    -1 = metronome, 0 = Poisson, -> 1 = heavy-tailed bursts), with the
    squared coefficient of variation CV^2 the queueing literature uses.

    Exactness: gaps are exact integer MICROSECONDS from per-user lead
    windows (sub-second timestamps truncate differently across engines
    at second grain); the global count/sum/sum-of-squares accumulate in
    BIGINT/DECIMAL, and mu, sigma, B, CV^2 are fixed double chains with
    try_divide for the single-event degenerate stream.

    Plan: one user-keyed shuffle for the lead window, one global 1-row
    moment aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select("ts", F.lead("ts", 1).over(w).alias("nxt"))
        .select(F.expr("timestampdiff(MICROSECOND, ts, nxt)").alias("gap"))
        .filter(F.col("gap").isNotNull())
    )
    dec = "decimal(38,0)"
    m = gaps.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap").alias("s1"),
        F.sum(F.col("gap").cast(dec) * F.col("gap").cast(dec)).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nd  # microseconds
    var = F.col("s2").cast("double") / nd - mu * mu
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    return m.select(
        F.col("n").cast("bigint").alias("n_gaps"),
        F.round(mu / F.lit(1000000.0), 6).alias("mean_gap_s"),
        F.round(sd / F.lit(1000000.0), 6).alias("sd_gap_s"),
        F.round(F.try_divide(var, mu * mu), 6).alias("cv_squared"),
        F.round(F.try_divide(sd - mu, sd + mu), 6).alias("burstiness_b"),
    )


def q_negative_binomial_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments negative-binomial fit of per-user event counts
    -- the modeling step the overdispersion gate points at (once
    variance > mean rules Poisson out, NB(r, p) is the standard heavy
    model for user activity; r is the "heterogeneity" shape, small r =
    a few superusers dominate): r = mu^2/(var - mu), p = mu/var.

    Exactness: per-user counts are integers; the global moments
    accumulate in BIGINT/DECIMAL; mu, var, r, p are fixed double chains,
    NULL when the sample is actually underdispersed (var <= mu -- NB
    undefined, the gate must say so rather than emit garbage).

    Plan: one user-keyed count shuffle, one 1-row moment aggregate."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("k"))
    dec = "decimal(38,0)"
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("s1"),
        F.sum(F.col("k").cast(dec) * F.col("k").cast(dec)).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nd
    var = F.col("s2").cast("double") / nd - mu * mu
    defined = var > mu
    return m.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.round(mu, 6).alias("mean_events"),
        F.round(var, 6).alias("var_events"),
        F.round(F.when(defined, (mu * mu) / (var - mu)), 6).alias("nb_r"),
        F.round(F.when(defined, mu / var), 6).alias("nb_p"),
    )


def q_hourly_uniformity_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square uniformity test of event volume across the 24 hours
    of day -- the load-shape gate (a pipeline scheduled off 'events are
    roughly uniform' must KNOW when that stops holding; diurnal skew is
    also the first symptom of a timezone bug in ingestion):
    chi2 = sum (o_h - n/24)^2 / (n/24) over the fixed 24-bin spine,
    with every hour reported against its expected share.

    Exactness: hour counts are exact integers from one scan; each
    cell's contribution is a fixed double chain rounded to 6 and
    decimal-summed over the 24-row spine (missing hours contribute the
    full expected mass via the left join from the literal spine).

    Plan: one 24-key rollup; everything after is 24-row algebra."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy(F.hour("ts").alias("h")).agg(F.count(F.lit(1)).alias("o"))
    spine = spark.range(24).select(F.col("id").cast("int").alias("h"))
    tot = per.agg(F.sum("o").alias("n"))
    full = (
        spine.join(per, "h", "left")
        .crossJoin(F.broadcast(tot))
        .select("h", F.coalesce("o", F.lit(0)).alias("o"), "n")
    )
    e = F.col("n").cast("double") / F.lit(24.0)
    contrib = F.round((F.col("o") - e) * (F.col("o") - e) / e, 6).cast(
        "decimal(27,6)"
    )
    agg = full.groupBy("n").agg(
        F.sum(contrib).alias("chi2"),
        F.max("o").alias("peak_count"),
        F.min("o").alias("trough_count"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_events"),
        F.round(F.col("chi2").cast("double"), 6).alias("chi_square"),
        F.lit(23).cast("bigint").alias("dof"),
        F.col("peak_count").cast("bigint").alias("peak_count"),
        F.col("trough_count").cast("bigint").alias("trough_count"),
        F.round(
            F.try_divide(
                F.col("peak_count").cast("double"),
                F.col("trough_count").cast("double"),
            ),
            6,
        ).alias("peak_trough_ratio"),
    )


BT_ITERS = 5  # unrolled minorize-maximize rounds
BT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_bradley_terry_strengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference strengths over the five event types --
    the pairwise-comparison ranking model (the same family RLHF reward
    models train on: wins between alternatives -> latent strengths):
    user u "prefers" type A over type B when cnt_u(A) > cnt_u(B); the
    win matrix feeds BT_ITERS unrolled MM rounds
    p_i <- W_i / sum_j n_ij / (p_i + p_j), renormalized each round --
    the pagerank/kmeans rounds-unrolled iterative template.

    Exactness: the win matrix is exact integers from one user-keyed
    rollup; every MM round's denominator terms round to 12 into DECIMAL
    before the per-type sum, and the normalized strengths round to 9,
    so the DuckDB unrolled-CTE twin matches bit-for-bit.

    Plan: one events->user shuffle, one 5x5 win rollup; each MM round
    is a join+agg over <= 20 bounded rows."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        *[
            F.sum((F.col("event_type") == t).cast("long")).alias(f"c{k}")
            for k, t in enumerate(BT_TYPES)
        ]
    )
    pairs = [
        (ki, ti, kj, tj)
        for ki, ti in enumerate(BT_TYPES)
        for kj, tj in enumerate(BT_TYPES)
        if ki != kj
    ]
    one = per_user.agg(
        *[
            F.sum((F.col(f"c{ki}") > F.col(f"c{kj}")).cast("long")).alias(
                f"w_{ki}_{kj}"
            )
            for ki, _ti, kj, _tj in pairs
        ]
    )
    wins = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ti).alias("i"),
                        F.lit(tj).alias("j"),
                        F.col(f"w_{ki}_{kj}").alias("w"),
                    )
                    for ki, ti, kj, tj in pairs
                ]
            )
        ).alias("x")
    ).select("x.*")
    rev = wins.select(
        F.col("i").alias("j_"), F.col("j").alias("i_"), F.col("w").alias("wr")
    )
    # tiny (<= 20-row) frames, localCheckpointed so the unrolled rounds do
    # not replan/rescan the event log (the pagerank exponential-replan fix)
    n = (
        wins.join(rev, (wins.i == rev.i_) & (wins.j == rev.j_))
        .select("i", "j", (F.col("w") + F.col("wr")).alias("n"))
        .localCheckpoint()
    )
    big_w = wins.groupBy("i").agg(F.sum("w").alias("W")).localCheckpoint()
    p = big_w.select("i", F.lit(0.2).alias("p"))
    for _ in range(BT_ITERS):
        pi = p.select(F.col("i").alias("pi_i"), F.col("p").alias("p_i"))
        pj = p.select(F.col("i").alias("pj_j"), F.col("p").alias("p_j"))
        term = (
            n.join(F.broadcast(pi), n.i == F.col("pi_i"))
            .join(F.broadcast(pj), n.j == F.col("pj_j"))
            .select(
                "i",
                F.round(
                    F.col("n").cast("double") / (F.col("p_i") + F.col("p_j")), 12
                )
                .cast("decimal(18,12)")
                .alias("t"),
            )
        )
        denom = term.groupBy("i").agg(F.sum("t").alias("d"))
        raw = big_w.join(denom, "i").select(
            "i",
            (F.col("W").cast("double") / F.col("d").cast("double")).alias("pr"),
        )
        tot = raw.agg(F.sum(F.round(F.col("pr"), 9).cast("decimal(18,9)")).alias("s"))
        p = (
            raw.crossJoin(F.broadcast(tot))
            .select(
                "i",
                F.round(
                    F.round(F.col("pr"), 9) / F.col("s").cast("double"), 9
                ).alias("p"),
            )
            .localCheckpoint()
        )
    return (
        p.join(big_w, "i")
        .select(
            F.col("i").alias("event_type"),
            F.col("W").cast("bigint").alias("n_wins"),
            F.col("p").alias("bt_strength"),
        )
        .orderBy("event_type")
    )


TOST_MARGIN_FRAC = 0.02  # equivalence margin: 2% of the pooled mean
Z_TWO_SIDED_95 = 1.959964  # two-sided 95% normal quantile (erf-locked)
Z_ONE_SIDED_95 = 1.644854  # one-sided 95% normal quantile (erf-locked)
Z_POWER_80 = 0.841621  # 80% power quantile (erf-locked)


def q_ab_effect_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d / Hedges' g effect size + the minimum detectable effect
    for the A/B spend split -- the two numbers a test READOUT needs that
    the t statistic alone hides (t confounds effect and sample size; d
    is the scale-free effect, MDE is what this sample could even see at
    80% power): d = (mA - mB)/s_pooled, g = J*d with the small-sample
    correction J = 1 - 3/(4 df - 1), MDE = (z_a + z_b) * se_welch.

    Exactness: the same decimal spend moments as q_ab_test_zscore; d, J,
    g, and MDE are fixed double chains with the erf-locked z literals.

    Plan: one per-user shuffle, 2-arm algebra."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(27,6)"
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value")).cast(dec)
                ),
                F.lit(0).cast(dec),
            ).alias("spend")
        )
        .withColumn("arm", _ab_arm(F.col("user_id")))
    )
    sq = F.col("spend").cast("decimal(18,6)")
    g = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("spend").cast("double").alias("s1"),
        F.sum(sq * sq).cast("double").alias("s2"),
    )
    a = g.filter(F.col("arm") == "A").select(
        F.col("n").alias("na"), F.col("s1").alias("sa"), F.col("s2").alias("qa")
    )
    b = g.filter(F.col("arm") == "B").select(
        F.col("n").alias("nb"), F.col("s1").alias("sb"), F.col("s2").alias("qb")
    )
    j = a.crossJoin(b)
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    ma = F.col("sa") / na
    mb = F.col("sb") / nb
    va = (F.col("qa") - F.col("sa") * F.col("sa") / na) / (na - F.lit(1.0))
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / nb) / (nb - F.lit(1.0))
    sp = F.sqrt(
        ((na - F.lit(1.0)) * va + (nb - F.lit(1.0)) * vb)
        / (na + nb - F.lit(2.0))
    )
    d = (ma - mb) / sp
    df = na + nb - F.lit(2.0)
    jcorr = F.lit(1.0) - F.lit(3.0) / (F.lit(4.0) * df - F.lit(1.0))
    se = F.sqrt(va / na + vb / nb)
    return j.select(
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
        F.round(d, 6).alias("cohens_d"),
        F.round(jcorr * d, 6).alias("hedges_g"),
        F.round(
            (F.lit(Z_TWO_SIDED_95) + F.lit(Z_POWER_80)) * se, 6
        ).alias("mde_spend"),
    )


def q_ab_equivalence_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test for the A/B spend split -- the test that
    can CONCLUDE 'no meaningful difference' (a non-significant t never
    can; two one-sided tests against a +-margin do): with margin =
    TOST_MARGIN_FRAC of the pooled mean, z_lower = (diff + m)/se and
    z_upper = (m - diff)/se must BOTH clear the one-sided 95% quantile.
    On this hash-null split the gate locks the pipeline by concluding
    equivalence.

    Exactness: same moments as the z gates; margin, both z's and the
    verdict are fixed double chains with erf-locked literals.

    Plan: one per-user shuffle, 2-arm algebra."""
    ev = load_table(spark, sf_dir, "events")
    dec = "decimal(27,6)"
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value")).cast(dec)
                ),
                F.lit(0).cast(dec),
            ).alias("spend")
        )
        .withColumn("arm", _ab_arm(F.col("user_id")))
    )
    sq = F.col("spend").cast("decimal(18,6)")
    g = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("spend").cast("double").alias("s1"),
        F.sum(sq * sq).cast("double").alias("s2"),
    )
    a = g.filter(F.col("arm") == "A").select(
        F.col("n").alias("na"), F.col("s1").alias("sa"), F.col("s2").alias("qa")
    )
    b = g.filter(F.col("arm") == "B").select(
        F.col("n").alias("nb"), F.col("s1").alias("sb"), F.col("s2").alias("qb")
    )
    j = a.crossJoin(b)
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    ma = F.col("sa") / na
    mb = F.col("sb") / nb
    va = (F.col("qa") - F.col("sa") * F.col("sa") / na) / (na - F.lit(1.0))
    vb = (F.col("qb") - F.col("sb") * F.col("sb") / nb) / (nb - F.lit(1.0))
    se = F.sqrt(va / na + vb / nb)
    pooled_mean = (F.col("sa") + F.col("sb")) / (na + nb)
    margin = F.lit(TOST_MARGIN_FRAC) * pooled_mean
    diff = ma - mb
    z_lo = (diff + margin) / se
    z_hi = (margin - diff) / se
    return j.select(
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
        F.round(diff, 6).alias("diff"),
        F.round(margin, 6).alias("margin"),
        F.round(z_lo, 6).alias("z_lower"),
        F.round(z_hi, 6).alias("z_upper"),
        (
            (z_lo > F.lit(Z_ONE_SIDED_95)) & (z_hi > F.lit(Z_ONE_SIDED_95))
        ).alias("equivalent"),
    )


PATHS_TOP = 10


def q_conversion_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event paths leading into first purchase -- the product
    question behind the attribution gates (Shapley/last-touch say which
    CHANNEL gets credit; this says which SEQUENCES users actually walk):
    the two events immediately preceding each user's first purchase,
    counted as 'a -> b -> purchase' paths with their share of all
    conversions.

    Exactness: path extraction is lag windows over the per-user total
    order (ts, event_id); counts are integers, the share one rounded
    division.

    Plan: one user-keyed window shuffle, one bounded path rollup."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_lags = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
        F.row_number().over(
            Window.partitionBy("user_id")
            .orderBy(
                F.when(F.col("event_type") == "purchase", 0).otherwise(1),
                "ts",
                "event_id",
            )
        ).alias("rn_first_purchase"),
    )
    firsts = with_lags.filter(
        (F.col("event_type") == "purchase") & (F.col("rn_first_purchase") == 1)
    )
    paths = firsts.select(
        F.coalesce(F.col("p2"), F.lit("(start)")).alias("step1"),
        F.coalesce(F.col("p1"), F.lit("(start)")).alias("step2"),
    ).groupBy("step1", "step2").agg(F.count(F.lit(1)).alias("n_conversions"))
    tot = paths.agg(F.sum("n_conversions").alias("t"))
    return (
        paths.crossJoin(F.broadcast(tot))
        .select(
            "step1",
            "step2",
            F.col("n_conversions").cast("bigint").alias("n_conversions"),
            F.round(
                F.col("n_conversions").cast("double") / F.col("t").cast("double"), 6
            ).alias("share"),
        )
        .orderBy(F.col("n_conversions").desc(), "step1", "step2")
        .limit(PATHS_TOP)
    )


def q_session_depth_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-depth distribution -- the engagement shape on top of
    q_sessionize's raw sessions (how many events does a session carry;
    the p50/p90 split one-and-done browsing from deep sessions):
    exact order-statistic percentiles over the bounded depth spine,
    plus the bounce share (single-event sessions).

    Exactness: session assignment is the sessionize device verbatim
    (30-min gap, lag + cumulative start flags); depths are integers;
    the percentiles are rank lookups, the bounce share one rounded
    division.

    Plan: one user-keyed window shuffle, one (depth) rollup, rank
    lookups on the bounded depth spine."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp").cast("long") - F.lag(
        F.col("ts").cast("timestamp").cast("long")
    ).over(w)
    sess = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    depths = sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("depth")
    )
    per_d = depths.groupBy("depth").agg(F.count(F.lit(1)).alias("c"))
    # distinct-depth spine is data-derived: range-partitioned cumsum
    from pgsf_spark.operators.ranking import global_cumsum

    cum = global_cumsum(
        per_d, [F.col("depth").asc()], {"cum": (F.col("c"), True)}
    ).select("depth", "c", "cum")
    tot = depths.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("depth").alias("s"),
        F.max("depth").alias("mx"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    agg = j.groupBy("n", "s", "mx").agg(
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(0.5) * F.col("n").cast("double")),
                F.col("depth"),
            )
        ).alias("p50"),
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(0.9) * F.col("n").cast("double")),
                F.col("depth"),
            )
        ).alias("p90"),
        F.sum(F.when(F.col("depth") == 1, F.col("c")).otherwise(0)).alias("bounces"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_sessions"),
        F.round(F.col("s").cast("double") / F.col("n").cast("double"), 6).alias(
            "mean_depth"
        ),
        F.col("p50").cast("bigint").alias("p50_depth"),
        F.col("p90").cast("bigint").alias("p90_depth"),
        F.col("mx").cast("bigint").alias("max_depth"),
        F.round(
            F.col("bounces").cast("double") / F.col("n").cast("double"), 6
        ).alias("bounce_share"),
    )


ERR_TOP_DAYS = 5


def q_error_rate_daily_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst error-rate days -- the SRE monitor view of the event stream
    (the overall error share is the SLO number; the extreme days are
    where the postmortems live): daily error-event share with the
    ERR_TOP_DAYS worst days and the overall rate on every row for
    context.

    Exactness: daily counts are integers; shares are single rounded
    divisions; ordering is (rate desc, day).

    Plan: one day-keyed rollup, bounded top-k on the day spine."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("errs"),
    )
    tot = daily.agg(
        F.sum("n").alias("tn"), F.sum("errs").alias("te")
    )
    j = daily.crossJoin(F.broadcast(tot))
    rate = F.round(F.col("errs").cast("double") / F.col("n").cast("double"), 6)
    return (
        j.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("bigint").alias("n_events"),
            F.col("errs").cast("bigint").alias("n_errors"),
            rate.alias("error_rate"),
            F.round(
                F.col("te").cast("double") / F.col("tn").cast("double"), 6
            ).alias("overall_rate"),
        )
        .orderBy(F.col("error_rate").desc(), "day")
        .limit(ERR_TOP_DAYS)
    )


RECENCY_BANDS = [(7, "active_7d"), (30, "active_30d")]


def q_user_recency_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User recency segmentation -- the lifecycle mix every growth
    dashboard leads with (how many users acted in the last 7 days, the
    last 30, or have gone dormant, measured against the stream's own
    horizon): per-user last-activity day bucketed into literal recency
    bands relative to the corpus max day.

    Exactness: day diffs are integers against the single max-day scalar
    (broadcast); band edges are literals; shares are rounded divisions.

    Plan: one user-keyed max rollup, one 3-row band aggregate."""
    ev = load_table(spark, sf_dir, "events")
    last = ev.groupBy("user_id").agg(F.max(F.to_date("ts")).alias("last_day"))
    horizon = ev.agg(F.max(F.to_date("ts")).alias("h"))
    j = last.crossJoin(F.broadcast(horizon)).select(
        F.datediff(F.col("h"), F.col("last_day")).alias("age")
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum((F.col("age") <= RECENCY_BANDS[0][0]).cast("long")).alias("a7"),
        F.sum((F.col("age") <= RECENCY_BANDS[1][0]).cast("long")).alias("a30"),
    )
    nd = F.col("n_users").cast("double")
    return agg.select(
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("a7").cast("bigint").alias("active_7d"),
        F.col("a30").cast("bigint").alias("active_30d"),
        (F.col("n_users") - F.col("a30")).cast("bigint").alias("dormant"),
        F.round(F.col("a7").cast("double") / nd, 6).alias("active_7d_share"),
        F.round(F.col("a30").cast("double") / nd, 6).alias("active_30d_share"),
    )


TLIFT_TOP = 10


def q_transition_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most over/under-represented event transitions -- the WHERE of the
    Markov structure (the stationary vector and conditional entropy are
    omnibus; lift = p(b|a)/p(b) names the transitions that actually
    deviate from independence, signed): the TLIFT_TOP transitions by
    |lift - 1|.

    Exactness: transition and marginal counts are exact integers from
    the shared lead-window device; lift is one fixed double chain
    rounded to 6; ordering is (|lift-1| desc, from, to).

    Plan: one user-keyed shuffle, bounded type-matrix algebra."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
        )
        .filter(F.col("e2").isNotNull())
        .groupBy("e1", "e2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    row_tot = pairs.groupBy("e1").agg(F.sum("c").alias("cx"))
    col_tot = pairs.groupBy("e2").agg(F.sum("c").alias("cy"))
    tot = pairs.agg(F.sum("c").alias("nt"))
    j = (
        pairs.join(F.broadcast(row_tot), "e1")
        .join(F.broadcast(col_tot), "e2")
        .crossJoin(F.broadcast(tot))
    )
    lift = (F.col("c").cast("double") / F.col("cx").cast("double")) / (
        F.col("cy").cast("double") / F.col("nt").cast("double")
    )
    return (
        j.select(
            F.col("e1").alias("from_event"),
            F.col("e2").alias("to_event"),
            F.col("c").cast("bigint").alias("n_transitions"),
            F.round(lift, 6).alias("lift"),
        )
        .orderBy(F.abs(F.col("lift") - 1).desc(), "from_event", "to_event")
        .limit(TLIFT_TOP)
    )

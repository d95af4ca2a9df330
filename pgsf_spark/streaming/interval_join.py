"""Stream-stream event-time interval join.

The marquee stateful Structured Streaming shape: two UNBOUNDED streams
joined on a key plus an event-time range (clicks in the 30 minutes before
each purchase). Both sides buffer in watermarked state; Spark derives the
state retention from the range condition itself -- a click can be evicted
once the watermark passes click_ts + window, a purchase once matched rows
can no longer arrive -- so state is bounded by (rate x window + lateness),
not stream lifetime. That bound is what makes the join runnable forever on
a 100 TB/day feed. Batch face is the identical join expression on static
frames (oracle-gated as clicks_30min_before_purchase), so parity between
faces is the same declarative predicate, not parallel code paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_purchase_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join purchases to same-user clicks with
    purchase_ts - window <= click_ts < purchase_ts.

    Both inputs must carry (user_id, event_id, ts). On streaming inputs a
    watermark is applied to BOTH sides (required for state eviction on a
    stream-stream inner join); on batch inputs withWatermark is a no-op
    and the exact same predicate runs as a plain join.
    """
    c = clicks.select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("cu") == F.col("pu"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("click_ts") < F.col("purchase_ts"))
    )
    return c.join(p, cond).select(
        F.col("pu").alias("user_id"), "purchase_id", "click_id", "click_ts", "purchase_ts"
    )

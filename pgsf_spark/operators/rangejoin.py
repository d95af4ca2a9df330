"""Bucketized range join: point-in-interval joins as shuffle equi-joins.

Spark has no native range-join optimization -- ``points JOIN ranges ON p >=
lo AND p < hi`` plans as BroadcastNestedLoopJoin (every point tested against
every range), which is O(|points| x |ranges|) and only survives while the
ranges side fits in a broadcast. The standard scalable rewrite (same trick
Databricks' range-join hints and every interval-join engine use) is bucket
expansion:

  1. pick a bucket width w;
  2. each range [lo, hi) is exploded to every bucket index it overlaps:
     sequence(floor(lo/w), floor(hi/w));
  3. each point lands in exactly one bucket floor(p/w);
  4. equi-join on the bucket index, then re-check the exact predicate.

Correctness: a point p with lo <= p < hi has floor(p/w) in
[floor(lo/w), floor(hi/w)], so every qualifying (point, range) pair meets in
some bucket; the residual filter removes the non-qualifying co-bucketed
pairs. Ranges may overlap each other arbitrarily (a point can match many
ranges) -- this is strictly more general than a groupBy-bucket histogram.

Scale: the shuffle key is the bucket index, so cost is one hash shuffle of
points plus |ranges| x (width/w + 1) exploded range rows -- choose w near
the typical range width so replication stays O(1) per range. Hot buckets
(many points in one bucket) are ordinary groupBy skew, handled by AQE skew
join. When the exploded ranges side is small Spark broadcasts it and the
shuffle disappears entirely (the gate query's plan: BroadcastHashJoin, zero
BroadcastNestedLoopJoin).

Reference parity: the reference engine has no range join either (its SOQL
layer only does equality predicates, soql.py:1); this is part of the
beyond-reference analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def bucketed_range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    *,
    inclusive_hi: bool = False,
) -> DataFrame:
    """Join each point row to every range row with lo <= point < hi
    (or <= hi when ``inclusive_hi``) via bucket-expansion equi-join.

    Column sets must be disjoint apart from the join being on values.
    Returns points' columns + ranges' columns, one row per qualifying pair.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    w = F.lit(float(bucket_width))
    pts = points.withColumn(_BUCKET, F.floor(F.col(point_col) / w).cast("long"))
    rng = ranges.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    hi_ok = (
        F.col(point_col) <= F.col(hi_col)
        if inclusive_hi
        else F.col(point_col) < F.col(hi_col)
    )
    return (
        pts.join(rng, _BUCKET)
        .filter((F.col(point_col) >= F.col(lo_col)) & hi_ok)
        .drop(_BUCKET)
    )

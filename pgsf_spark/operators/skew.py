"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting handles sort-merge skew automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py); these helpers cover
the cases AQE can't: hot-key *broadcast-ineligible* joins and high-cardinality
aggregations with a few monster keys.

Pattern (standard): replicate the small side R times, salt the big side with
hash(row) % R, join on (key, salt). The shuffle spreads each hot key over R
partitions; correctness is unchanged because every big-side row still meets
its full key group exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big⋈small on a skewed key, salted into ``salt_buckets``.

    ``small`` is exploded x salt_buckets (keep it genuinely small); ``big``
    gets a deterministic per-row salt. Result columns = big ∪ small minus
    the helper columns.

    Only join types where every output row is driven by a big-side match are
    allowed: for right/full outer, an unmatched small-side row would surface
    once per salt replica (ADVICE r1) -- rejected with ValueError.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched small-side rows "
            "would be duplicated once per salt bucket (use AQE skew join for outer joins)"
        )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    # deterministic salt: stable under retries (no rand() -- task retries
    # must not re-shuffle rows into different buckets mid-query)
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)).cast("int")
    )
    out = salted_big.join(salted_small, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def skew_hedged_join(
    big: DataFrame,
    dim: DataFrame,
    on: str,
    hot_threshold: int = 256,
    how: str = "inner",
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Join ``big`` (join key repeated -- e.g. candidate pairs keyed by doc)
    against ``dim`` (key unique -- e.g. a per-doc feature table) with hot
    keys hedged out of the shuffle.

    salted_join's replicate-the-small-side pattern is wrong here: ``dim`` is
    the whole corpus, and exploding it R times is an R x corpus shuffle.
    Instead, split by observed fan-out: keys with more than ``hot_threshold``
    big-side rows (a doc in thousands of candidate pairs) take the broadcast
    path -- their few dim rows are broadcast, so the hot key's work stays
    spread across big's partitioning and no shuffled partition concentrates
    it. The cold majority joins normally (AQE skew-split still backstops
    it). Exact for inner/left-semi shapes: the hot/cold key sets partition
    the big side, so the union reconstructs the plain join.

    ``big`` is scanned twice (fan-out count + join) -- callers should
    localCheckpoint a big that is expensive to recompute, or pass
    ``hot_keys`` (a 1-column DF of keys) computed from a cheaper equivalent
    source (e.g. the raw pair list before upstream joins that preserve
    multiplicity)."""
    if how != "inner":
        raise ValueError("skew_hedged_join supports inner joins (the verify-join shape)")
    if hot_keys is None:
        hot_keys = (
            big.groupBy(on)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > hot_threshold)
            .select(on)
        )
    big_cold = big.join(F.broadcast(hot_keys), on, "left_anti")
    big_hot = big.join(F.broadcast(hot_keys), on, "left_semi")
    dim_hot = dim.join(F.broadcast(hot_keys), on, "left_semi")
    cold = big_cold.join(dim, on, how)
    hot = big_hot.join(F.broadcast(dim_hot), on, how)
    return cold.unionByName(hot)


def salted_count(df: DataFrame, key: str, salt_buckets: int = 16) -> DataFrame:
    """Two-phase count for skewed group keys: partial count on (key, salt),
    final sum on key. Map-side combine already does this for counts -- the
    helper exists for plug-in use with agg functions that don't combine
    (e.g. collect_list) and as the documented pattern."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").alias("n"))

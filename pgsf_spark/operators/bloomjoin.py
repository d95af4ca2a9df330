"""Bloom-prefiltered join: the classic 100 TB shuffle-pruning trick.

Joining a huge fact side against a selective dimension normally shuffles
the ENTIRE fact table on the join key and discards most of it at the join.
A bloom filter built from the dimension keys (mergeable bit_or aggregate,
m/64 packed words) broadcasts for ~free and filters fact rows BEFORE the
exchange, so the shuffle moves only probable matches; the exact join then
removes the bloom's false positives. The final result is therefore
EXACTLY the plain join's -- the filter changes bytes moved, never answers.
(Spark's own runtime row-level filtering does this automatically in some
shapes; this operator makes it explicit, tunable, and usable on any plan.)

Reference parity: pgsf has no distributed joins at all -- this is part of
the engine-side analytics surface the survey's §2.6 extension covers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BJ_BITS = 1 << 16  # filter size m (64k bits = 1k packed words)
BJ_WORD = 64
BJ_K = 3  # hash functions


def _positions(col: Column):
    hs = []
    for i in range(BJ_K):
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bj{i}:"), col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        hs.append((h % BJ_BITS).cast("int"))
    return F.array(*hs)


def bloom_filter_build(keys: DataFrame, key: str) -> DataFrame:
    """(word -> packed bits) bloom filter over ``keys[key]``. bit_or is the
    merge operator, so partial per-partition filters combine losslessly in
    the map-side aggregate -- the only shuffle is ≤ m/64 packed words."""
    return (
        keys.select(F.explode(_positions(F.col(key))).alias("p"))
        .select(
            (F.col("p") / BJ_WORD).cast("int").alias("word"),
            F.expr(f"shiftleft(1L, p % {BJ_WORD})").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("w"))
    )


def _positions_sql(key: str) -> str:
    return (
        "array("
        + ",".join(
            f"cast(conv(substring(md5(concat('bj{i}:', cast({key} as string))),1,8),16,10) as bigint)"
            f" % {BJ_BITS}"
            for i in range(BJ_K)
        )
        + ")"
    )


def bloom_prefilter(big: DataFrame, bloom: DataFrame, key: str) -> DataFrame:
    """Keep only ``big`` rows whose key MIGHT be in the filter (all K bits
    set). The packed filter (<= m/64 longs, ~8 KB at the default size) is
    collected once and embedded as an array LITERAL -- the same move as the
    hyperplane-LSH plane weights -- so the membership test is a PURE
    PROJECTION over the big side: no explode, no join, no shuffle, and it
    rides inside whole-stage codegen right above the scan."""
    words = {r["word"]: r["w"] for r in bloom.collect()}
    arr = [int(words.get(i, 0)) for i in range(BJ_BITS // BJ_WORD)]
    cond = F.expr(
        f"forall({_positions_sql(key)},"
        f" p -> ((shiftright(element_at(__bloom, cast(p / {BJ_WORD} as int) + 1),"
        f" cast(p % {BJ_WORD} as int)) & 1)) = 1)"
    )
    return big.withColumn("__bloom", F.lit(arr)).filter(cond).drop("__bloom")


def bloom_semi_join(big: DataFrame, small: DataFrame, key: str) -> DataFrame:
    """Exact ``big JOIN small USING (key)`` with the big side bloom-pruned
    before its shuffle. Identical rows to the plain join (false positives
    die in the exact join); at scale the win is that the exchange under the
    join moves only probable matches."""
    bloom = bloom_filter_build(small.select(key).distinct(), key)
    return bloom_prefilter(big, bloom, key).join(small, key)

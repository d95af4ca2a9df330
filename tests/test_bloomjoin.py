"""Bloom-prefiltered join: exactness vs the plain join, shuffle-free
prefilter plan, and actual pruning on a selective dimension."""

from pyspark.sql import functions as F

from pgsf_spark.operators.bloomjoin import (
    bloom_filter_build,
    bloom_prefilter,
    bloom_semi_join,
)


class TestBloomJoin:
    def test_exact_vs_plain_join(self, spark):
        big = spark.range(0, 20_000).select(
            F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
        )
        small = spark.range(0, 20_000, 13).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        got = sorted(map(tuple, bloom_semi_join(big, small, "k").collect()))
        want = sorted(map(tuple, big.join(small, "k").collect()))
        assert got == want and len(want) == len(range(0, 20_000, 13))

    def test_prefilter_is_pure_projection(self, spark):
        # the membership test must be a filter above the scan: no Exchange,
        # no Join in the big side's plan (the 8KB filter rides as a literal)
        big = spark.range(0, 1000).select(F.col("id").alias("k"))
        bloom = bloom_filter_build(
            spark.range(0, 100).select(F.col("id").alias("k")), "k"
        )
        plan = (
            bloom_prefilter(big, bloom, "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Join" not in plan

    def test_prunes_most_nonmembers(self, spark):
        # 1% member density: the prefilter must drop the vast majority of
        # the big side (bloom FP rate at 64k bits / 100 keys is tiny)
        big = spark.range(0, 50_000).select(F.col("id").alias("k"))
        small = spark.range(0, 500).select((F.col("id") * 100).alias("k"))
        bloom = bloom_filter_build(small, "k")
        kept = bloom_prefilter(big, bloom, "k").count()
        assert kept >= 500  # never drops a true member
        assert kept < 2_000  # prunes >96% of non-members

    def test_no_false_negatives_property(self, spark):
        # every small-side key must survive the prefilter regardless of key
        # distribution (negative keys, clusters, duplicates)
        keys = [(-(10**9),), (0,), (1,), (1,), (999_983,), (2**40,)]
        small = spark.createDataFrame(keys, "k long").distinct()
        bloom = bloom_filter_build(small, "k")
        kept = {r["k"] for r in bloom_prefilter(small, bloom, "k").collect()}
        assert kept == {k for (k,) in keys}


class TestSnapshotDiff:
    def test_statuses_and_attribution(self, spark):
        from pgsf_spark.operators.diff import diff_column_counts, snapshot_diff

        old = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
            "k long, name string, bal double",
        )
        new = spark.createDataFrame(
            # 1 unchanged; 2 bal changed; 3 NULL->value change; 4 removed; 5 added
            [(1, "a", 10.0), (2, "b", 25.0), (3, "c", 3.0), (5, "e", 50.0)],
            "k long, name string, bal double",
        )
        d = snapshot_diff(old, new, "k")
        got = {r["k"]: (r["status"], sorted(r["changed_cols"])) for r in d.collect()}
        assert got == {
            1: ("unchanged", []),
            2: ("changed", ["bal"]),
            3: ("changed", ["bal"]),
            4: ("removed", []),
            5: ("added", []),
        }
        counts = {r["col"]: r["n_changed"] for r in diff_column_counts(d).collect()}
        assert counts == {"bal": 2}

    def test_all_null_row_still_diffs_by_presence(self, spark):
        # presence markers, not column nullability: a row that is all-NULL
        # except the key must read as present on both sides and unchanged
        from pgsf_spark.operators.diff import snapshot_diff

        old = spark.createDataFrame([(1, None)], "k long, v string")
        new = spark.createDataFrame([(1, None)], "k long, v string")
        d = snapshot_diff(old, new, "k").collect()
        assert [(r["k"], r["status"]) for r in d] == [(1, "unchanged")]

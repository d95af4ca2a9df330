"""Bucketized range join: exactness vs the naive theta-join, overlap
semantics, boundary cases, and the plan property that justifies it (equi-
join, never BroadcastNestedLoopJoin)."""

import pytest
from pyspark.sql import functions as F

from pgsf_spark.operators.rangejoin import bucketed_range_join


def _points(spark, vals):
    return spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)], "pid long, p double")


def _ranges(spark, triples):
    return spark.createDataFrame(
        [(i, float(lo), float(hi)) for i, (lo, hi) in enumerate(triples)],
        "rid long, lo double, hi double",
    )


def _pairs(df):
    return sorted((r.pid, r.rid) for r in df.select("pid", "rid").collect())


class TestBucketedRangeJoin:
    def test_matches_naive_join(self, spark):
        pts = _points(spark, [0, 1, 5, 9.5, 10, 17, 25, 33, 50])
        rng = _ranges(spark, [(0, 10), (5, 20), (18, 18.5), (30, 60), (90, 95)])
        got = bucketed_range_join(pts, rng, "p", "lo", "hi", 7.0)
        naive = pts.join(rng, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi")))
        assert _pairs(got) == _pairs(naive)

    def test_overlapping_ranges_multi_match(self, spark):
        pts = _points(spark, [10.0])
        rng = _ranges(spark, [(0, 20), (5, 15), (10, 11), (11, 12)])
        # point 10 is inside the first three ranges, not the fourth
        assert _pairs(bucketed_range_join(pts, rng, "p", "lo", "hi", 4.0)) == [
            (0, 0), (0, 1), (0, 2),
        ]

    def test_hi_exclusive_vs_inclusive(self, spark):
        pts = _points(spark, [10.0])
        rng = _ranges(spark, [(0, 10)])
        assert _pairs(bucketed_range_join(pts, rng, "p", "lo", "hi", 3.0)) == []
        got = bucketed_range_join(pts, rng, "p", "lo", "hi", 3.0, inclusive_hi=True)
        assert _pairs(got) == [(0, 0)]

    def test_negative_values_and_boundary_buckets(self, spark):
        # floor semantics must hold below zero too
        pts = _points(spark, [-5, -0.5, 0, 6.999, 7])
        rng = _ranges(spark, [(-10, 0), (0, 7), (-1, 8)])
        naive = pts.join(rng, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi")))
        got = bucketed_range_join(pts, rng, "p", "lo", "hi", 7.0)
        assert _pairs(got) == _pairs(naive)

    @pytest.mark.parametrize("w", [0.5, 3.0, 18.0, 1000.0])
    def test_bucket_width_is_semantics_free(self, spark, w):
        pts = _points(spark, range(0, 40, 3))
        rng = _ranges(spark, [(i * 4.0, i * 4.0 + 10.0) for i in range(9)])
        naive = pts.join(rng, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi")))
        assert _pairs(bucketed_range_join(pts, rng, "p", "lo", "hi", w)) == _pairs(naive)

    def test_invalid_width_rejected(self, spark):
        pts, rng = _points(spark, [1]), _ranges(spark, [(0, 2)])
        with pytest.raises(ValueError):
            bucketed_range_join(pts, rng, "p", "lo", "hi", 0)

    def test_plan_is_equi_join_not_nested_loop(self, spark):
        from pgsf_spark.analytics.registry import QUERIES

        plan = (
            QUERIES["range_band_join"].fn(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the whole point: the naive BETWEEN join would be a
        # BroadcastNestedLoopJoin; the rewrite must plan as a hash equi-join
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "HashJoin" in plan


class TestRangeJoinProperty:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        pts=st.lists(
            st.floats(-100, 100, allow_nan=False, allow_infinity=False), min_size=0, max_size=25
        ),
        rngs=st.lists(
            st.tuples(
                st.floats(-100, 100, allow_nan=False, allow_infinity=False),
                st.floats(0.125, 60, allow_nan=False, allow_infinity=False),
            ),
            min_size=0,
            max_size=12,
        ),
        w=st.sampled_from([0.7, 3.0, 11.0, 50.0]),
    )
    def test_matches_naive_on_random_data(self, spark, pts, rngs, w):
        from pyspark.sql import functions as F

        from pgsf_spark.operators.rangejoin import bucketed_range_join

        p = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(pts)], "pid long, p double"
        )
        r = spark.createDataFrame(
            [(i, float(lo), float(lo + ln)) for i, (lo, ln) in enumerate(rngs)],
            "rid long, lo double, hi double",
        )
        got = sorted(
            (x.pid, x.rid)
            for x in bucketed_range_join(p, r, "p", "lo", "hi", w).select("pid", "rid").collect()
        )
        want = sorted(
            (x.pid, x.rid)
            for x in p.join(r, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi")))
            .select("pid", "rid")
            .collect()
        )
        assert got == want

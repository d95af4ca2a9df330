"""Bucketed-table layout: the merge-side shuffle must disappear."""

import pytest
from pyspark.sql import functions as F

from pgsf_spark.operators.bucketed import bucketed_join, write_bucketed


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    # tables land in the session warehouse dir (static conf); DROP cleans up
    a = spark.createDataFrame([(i, f"n{i}") for i in range(1000)], "k long, name string")
    b = spark.createDataFrame([(i, i * 1.0) for i in range(0, 1000, 3)], "k long, v double")
    write_bucketed(a, "bk_target", "k", n_buckets=8, sort_cols=["k"])
    write_bucketed(b, "bk_changes", "k", n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS bk_target")
    spark.sql("DROP TABLE IF EXISTS bk_changes")


class TestBucketedJoin:
    def test_no_exchange_on_bucketed_join(self, spark, bucketed_pair):
        # disable auto-broadcast so the test exercises the shuffle path
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = bucketed_join(spark, "bk_target", "bk_changes", "k")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in plan  # both sides pre-bucketed
            assert j.count() == 334
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_unbucketed_join_has_exchange(self, spark, bucketed_pair):
        # control: the same join without bucketing shuffles
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            a = spark.table("bk_target").repartition(7)  # destroy the layout
            b = spark.table("bk_changes").repartition(7)
            plan = a.join(b, "k")._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

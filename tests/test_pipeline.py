"""Composed corpus-build pipeline (quality -> dedup -> split): semantics and
plan shape."""

from pyspark.sql import functions as F

from pgsf_spark.analytics.pipeline import quality_flags


class TestQualityFlags:
    def test_first_failing_rule_wins(self, spark):
        rows = [
            (1, "one two three"),  # 3 tokens -> too_few_tokens
            (2, "a b c d e f g h i j k l m"),  # 13 short tokens -> short ratio
            (3, "123456789 123456789 " * 10 + "word wordy wording more tokens here ok fine"),  # digits
            (4, "perfectly reasonable document text with enough long tokens present here today again"
                " and even more substantial wording follows"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: (r["keep"], r["drop_reason"]) for r in quality_flags(df).collect()}
        assert got[1] == (False, "too_few_tokens")
        assert got[2] == (False, "too_many_short_tokens")
        assert got[3] == (False, "too_many_digits")
        assert got[4] == (True, None)

    def test_pure_projection(self, spark):
        df = spark.range(0, 10, numPartitions=4).select(
            F.col("id").alias("doc_id"), F.lit("some text here").alias("text")
        )
        plan = quality_flags(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestManifestPlan:
    def test_two_shuffles_end_to_end(self, spark):
        # the full manifest must be exactly: scan -> fingerprint groupBy
        # (1 exchange pair) -> semi join (broadcast or 1 more exchange) ->
        # split projection. No windows, no extra shuffles.
        from pgsf_spark.analytics.pipeline import q_training_manifest

        plan = (
            q_training_manifest(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "Window" not in plan
        # groupBy partial+final = at most 2 hash exchanges; the semi join may
        # add one per side at scale but must broadcast at this size
        assert plan.count("Exchange hashpartitioning") <= 2

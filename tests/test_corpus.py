"""Corpus-level quality/contamination operators (analytics/corpus.py)."""

import pytest
from pyspark.sql import functions as F

from pgsf_spark.analytics import corpus

SF = "/root/testdata/sf0.001"


class TestNgramArray:
    def test_basic_2grams(self, spark):
        df = spark.createDataFrame([("a b c d",)], "text string")
        got = df.select(corpus.ngram_array(corpus._toks(F.col("text")), 2).alias("g")).first()["g"]
        assert got == ["a b", "b c", "c d"]

    def test_short_doc_empty_not_descending(self, spark):
        # sequence(1, 0) is the DESCENDING [1, 0] in Spark -- the guard must
        # return [] for docs shorter than n, not a bogus 2-element array
        df = spark.createDataFrame([("a",), ("a b",)], "text string")
        got = [
            r["g"]
            for r in df.select(
                corpus.ngram_array(corpus._toks(F.col("text")), 3).alias("g")
            ).collect()
        ]
        assert got == [[], []]

    def test_exact_length_doc(self, spark):
        df = spark.createDataFrame([("x y z",)], "text string")
        got = df.select(corpus.ngram_array(corpus._toks(F.col("text")), 3).alias("g")).first()["g"]
        assert got == ["x y z"]


class TestRepetitionStats:
    def test_pathological_loop_doc(self, spark):
        d = spark.createDataFrame(
            [(1, "spam spam spam spam spam"), (2, "all words here are unique")],
            "doc_id int, text string",
        )
        got = {r["doc_id"]: r for r in corpus.repetition_stats(d).collect()}
        # doc 1: all four 2-grams are "spam spam" -> top fraction 1.0
        assert got[1]["top_2gram_frac"] == 1.0 and got[1]["dup_2gram_frac"] == 1.0
        assert got[2]["top_2gram_frac"] == 0.25 and got[2]["dup_2gram_frac"] == 0.0


class TestBoilerplate:
    def test_shared_ngram_flagged(self, spark):
        shared = "click here to subscribe"
        docs = [(i, f"{shared} body{i} text{i} filler{i}") for i in range(6)]
        docs.append((99, "completely original content nothing shared"))
        d = spark.createDataFrame(docs, "doc_id int, text string")
        got = {r["doc_id"]: r for r in corpus.boilerplate_scores(d, min_docs=5).collect()}
        # "click here to" / "here to subscribe" appear in 6 docs -> boilerplate
        assert got[0]["n_boilerplate"] == 2
        assert got[99]["n_boilerplate"] == 0


class TestContamination:
    def test_benchmark_side_broadcast(self, spark):
        df = corpus.q_benchmark_contamination(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # corpus side never shuffles for the probe

    def test_benchmark_docs_excluded_from_candidates(self, spark):
        df = corpus.q_benchmark_contamination(spark, SF)
        assert df.filter(F.col("doc_id") % corpus.BENCH_MOD == 0).count() == 0

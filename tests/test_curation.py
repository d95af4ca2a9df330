"""Model-based curation: distilled quality classifier, bigram-LM
perplexity, DSIR importance weights (analytics/curation.py)."""

from pgsf_spark.analytics import curation

SF = "/root/testdata/sf0.001"


def _write_documents(spark, path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(f"{path}/documents.parquet")


class TestQualityClassifier:
    def test_learns_to_rank_the_judge(self, spark):
        row = curation.q_quality_classifier_gate(spark, SF).collect()[0]
        # the linear model must RANK kept docs above dropped ones far better
        # than chance (AUC), even though the 0.5 threshold on this skewed
        # corpus reduces to the base rate
        assert row["auc"] > 0.85
        assert row["n_pos"] + row["n_neg"] == 500
        assert row["train_acc"] >= row["n_pos"] / (row["n_pos"] + row["n_neg"]) - 1e-9

    def test_deterministic_weights(self, spark):
        a = curation.q_quality_classifier_gate(spark, SF).collect()[0]
        b = curation.q_quality_classifier_gate(spark, SF).collect()[0]
        assert a == b

    def test_softsign_is_a_sigmoid(self, spark):
        import pyspark.sql.functions as F

        df = spark.range(1).select(
            curation._softsign(F.lit(0.0)).alias("mid"),
            curation._softsign(F.lit(100.0)).alias("hi"),
            curation._softsign(F.lit(-100.0)).alias("lo"),
        )
        r = df.collect()[0]
        assert r["mid"] == 0.5 and r["hi"] > 0.99 and r["lo"] < 0.01


class TestDocPerplexity:
    def test_repetitive_doc_scores_lower_nll(self, spark, tmp_path):
        # five docs of the same repeated bigram build up its count; one doc
        # of all-distinct bigrams is surprising under the corpus LM
        rows = [(i, "x y x y x y x y x y", "en", "s", 19) for i in range(5)]
        rows.append((9, "a b c d e f g h i j", "en", "s", 19))
        _write_documents(spark, tmp_path, rows)
        got = {r["doc_id"]: r for r in curation.q_doc_perplexity(spark, str(tmp_path)).collect()}
        assert got[0]["n_bigrams"] == 9
        assert got[0]["nll"] < got[9]["nll"]

    def test_single_token_doc_has_no_bigrams(self, spark, tmp_path):
        rows = [(0, "solo", "en", "s", 4), (1, "two words here", "en", "s", 14)]
        _write_documents(spark, tmp_path, rows)
        got = {r["doc_id"]: r for r in curation.q_doc_perplexity(spark, str(tmp_path)).collect()}
        assert 0 not in got  # no bigram rows -> absent from the report
        assert got[1]["n_bigrams"] == 2


class TestDsirWeights:
    def test_target_lookalikes_weigh_positive(self, spark, tmp_path):
        rows = [(i, "alpha alpha alpha alpha", "en", "s", 23) for i in range(5)]
        rows += [(10 + i, "beta beta beta beta", "zh", "s", 19) for i in range(5)]
        _write_documents(spark, tmp_path, rows)
        got = {r["doc_id"]: r for r in curation.q_dsir_weights(spark, str(tmp_path)).collect()}
        assert got[0]["log_weight"] > 0 > got[10]["log_weight"]
        assert got[0]["n_tokens"] == 4

    def test_weights_sum_structure_on_real_data(self, spark):
        rows = curation.q_dsir_weights(spark, SF).collect()
        assert len(rows) == 500
        # importance weights of the target slice must average higher than
        # the rest (the defining property of the likelihood-ratio score)
        tgt = [r["log_weight"] for r in rows if r["lang"] == curation.DSIR_TARGET_LANG]
        rest = [r["log_weight"] for r in rows if r["lang"] != curation.DSIR_TARGET_LANG]
        assert sum(tgt) / len(tgt) > sum(rest) / len(rest)

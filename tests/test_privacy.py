"""Privacy audits (analytics/privacy.py) + ANN nDCG gate (similarity.py)."""

import math

from pgsf_spark.analytics import privacy, similarity

SF = "/root/testdata/sf0.001"


def _write_customer(spark, path, rows):
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    )
    df.write.mode("overwrite").parquet(f"{path}/customer.parquet")


class TestKAnonymity:
    def test_small_class_flagged(self, spark, tmp_path):
        rows = [(i, f"c{i}", 1, 500.0, "BUILDING") for i in range(10)]  # class of 10
        rows += [(100, "c100", 2, 500.0, "MACHINERY"), (101, "c101", 2, 500.0, "MACHINERY")]
        _write_customer(spark, tmp_path, rows)
        got = privacy.q_k_anonymity_audit(spark, str(tmp_path)).collect()[0]
        assert got["n_classes"] == 2
        assert got["classes_below_k"] == 1
        assert got["records_at_risk"] == 2
        assert got["min_class_size"] == 2
        assert abs(got["at_risk_pct"] - 100.0 * 2 / 12) < 1e-3

    def test_real_data_invariants(self, spark):
        got = privacy.q_k_anonymity_audit(spark, SF).collect()[0]
        assert got["classes_below_k"] <= got["n_classes"]
        assert 0 <= got["at_risk_pct"] <= 100


class TestDpRelease:
    def test_noise_is_deterministic_and_finite(self, spark):
        a = privacy.q_dp_segment_counts(spark, SF).collect()
        b = privacy.q_dp_segment_counts(spark, SF).collect()
        assert a == b
        for r in a:
            assert math.isfinite(r["noise"])
            assert abs(r["released_count"] - (r["true_count"] + r["noise"])) < 1e-3

    def test_noise_scale_plausible(self, spark):
        # Laplace(1/eps) with eps=0.5 has b=2: P(|noise| > 20) = e^-10 ~ 5e-5;
        # the 5 fixed draws must be in a sane band (regression guard on the
        # inverse-CDF arithmetic, not a statistical test)
        rows = privacy.q_dp_segment_counts(spark, SF).collect()
        assert all(abs(r["noise"]) < 25 for r in rows)


class TestAnnNdcg:
    def test_bounds_and_consistency_with_recall(self, spark):
        nd = similarity.q_ann_ndcg_gate(spark, SF).collect()[0]
        rc = similarity.q_ann_recall_at_5(spark, SF).collect()[0]
        assert 0.0 <= nd["ndcg"] <= 1.0
        assert nd["dcg"] <= nd["idcg"] + 1e-9
        assert nd["n_hits"] == rc["n_hits"]  # same lists, same overlap

    def test_perfect_list_scores_one(self, spark):
        # nDCG of the exact list against itself must be exactly 1
        import pyspark.sql.functions as F
        from pyspark.sql.window import Window

        disc = similarity._ndcg_discounts()
        idcg = sum((similarity.NDCG_K + 1 - r) * disc[r - 1] for r in range(1, similarity.NDCG_K + 1))
        exact = similarity.q_cosine_topk(spark, SF).limit(similarity.NDCG_K).select(
            "vec_id",
            F.row_number().over(Window.orderBy(F.col("cosine").desc(), "vec_id")).alias("r"),
        )
        dcg = exact.select(
            ((F.lit(similarity.NDCG_K + 1) - F.col("r"))
             * F.element_at(F.array(*[F.lit(d) for d in disc]), F.col("r"))).alias("g")
        ).agg(F.sum("g").alias("dcg")).collect()[0]["dcg"]
        assert abs(dcg / idcg - 1.0) < 1e-12

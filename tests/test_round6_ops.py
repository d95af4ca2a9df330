"""Semantics tests for the round-6 operators (the oracle gates check
cross-engine parity; these check the MATH means what the docstrings say)."""

import pytest
from pyspark.sql import functions as F

from pgsf_spark.analytics import dedup, linkage, profiling, sampling

SF = "/root/testdata/sf0.001"


class TestSpearman:
    def test_rho_in_range_and_n_days(self, spark):
        row = profiling.q_spearman_trend(spark, SF).collect()[0]
        assert -1.0 <= row.spearman_rho <= 1.0
        assert row.n_days > 100

    def test_monotone_series_gives_rho_one(self, spark, tmp_path):
        # perfectly increasing revenue by day -> rho exactly 1
        df = spark.createDataFrame(
            [(f"2024-01-{d:02d}", float(d)) for d in range(1, 29)],
            "o_orderdate string, o_totalprice double",
        ).select(F.to_timestamp("o_orderdate").alias("o_orderdate"), "o_totalprice")
        df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        row = profiling.q_spearman_trend(spark, str(tmp_path)).collect()[0]
        assert row.spearman_rho == 1.0
        assert row.n_days == 28


class TestChiSquare:
    def test_shape_and_bounds(self, spark):
        row = profiling.q_chi_square_independence(spark, SF).collect()[0]
        assert row.dof == (row.n_segments - 1) * (row.n_nations - 1)
        assert row.chi_square >= 0.0
        assert 0.0 <= row.cramers_v <= 1.0


class TestHits:
    def test_topk_scores_normalized(self, spark):
        rows = linkage.q_hits_hubs_authorities(spark, SF).collect()
        assert len(rows) == linkage.HITS_TOP
        scores = [float(r.authority) for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert scores[0] == 1.0  # max-normalized: the top authority is 1
        assert all(2 <= r.deg <= linkage.AA_MAX_DEG for r in rows)


class TestLshRecallAudit:
    def test_counts_consistent(self, spark):
        row = dedup.q_lsh_recall_audit(spark, SF).collect()[0]
        assert row.n_found <= row.n_true_pairs
        assert row.n_found <= row.n_candidate_pairs
        if row.n_true_pairs:
            assert row.recall == pytest.approx(row.n_found / row.n_true_pairs, abs=1e-6)


class TestNegativeSamples:
    def test_k_per_anchor_and_source_exclusion(self, spark):
        rows = sampling.q_negative_samples(spark, SF).collect()
        assert rows, "anchor slots selected no docs"
        per_anchor = {}
        for r in rows:
            assert r.neg_source != r.anchor_source
            assert r.neg_id != r.anchor_id
            per_anchor.setdefault(r.anchor_id, []).append(r.rank)
        for ranks in per_anchor.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= sampling.NEG_K

    def test_deterministic_across_runs(self, spark):
        a = [tuple(r) for r in sampling.q_negative_samples(spark, SF).collect()]
        b = [tuple(r) for r in sampling.q_negative_samples(spark, SF).collect()]
        assert sorted(a) == sorted(b)

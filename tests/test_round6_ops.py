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


class TestStlDecomposition:
    def test_seasonal_profile_shape(self, spark):
        rows = profiling.q_stl_decomposition(spark, SF).collect()
        assert len(rows) == 7
        assert sorted(r.dow for r in rows) == list(range(1, 8))
        shares = {r.seasonal_share for r in rows}
        assert len(shares) == 1  # window total repeated per row
        assert 0.0 <= shares.pop() <= 1.0


class TestExactMedianRefinement:
    def test_matches_sorted_kth(self, spark):
        from pgsf_spark.tables import load_table

        row = profiling.q_exact_median_refinement(spark, SF).collect()[0]
        vals = sorted(
            r.v
            for r in load_table(spark, SF, "orders")
            .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("v"))
            .collect()
        )
        k = (len(vals) + 1) // 2
        assert row.n_orders == len(vals)
        assert row.median_cents == vals[k - 1]

    def test_tiny_input_converges(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(f"2024-01-{d:02d}", float(p)) for d, p in enumerate([5, 1, 9, 3, 7], 1)],
            "o_orderdate string, o_totalprice double",
        ).select(F.to_timestamp("o_orderdate").alias("o_orderdate"), "o_totalprice")
        df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
        row = profiling.q_exact_median_refinement(spark, str(tmp_path)).collect()[0]
        assert (row.n_orders, row.median_cents) == (5, 500)


class TestTargetEncodingOof:
    def test_oof_excludes_own_fold(self, spark):
        from pgsf_spark.analytics import curation
        from pgsf_spark.tables import load_table

        rows = curation.q_target_encoding_oof(spark, SF).collect()
        assert rows
        # recompute one cell the slow way
        r0 = rows[0]
        o = load_table(spark, SF, "orders").select(
            F.col("o_orderpriority").alias("cat"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("te6:"), F.col("o_orderkey").cast("string"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % curation.TE_K
            ).cast("int").alias("fold"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        other = o.filter((F.col("cat") == r0.category) & (F.col("fold") != r0.fold)).agg(
            F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        assert r0.oof_mean_usd == pytest.approx(other.s / other.n / 100.0, abs=1e-6)


class TestWeightedSample:
    def test_long_docs_overrepresented(self, spark):
        from pgsf_spark.tables import load_table

        rows = sampling.q_weighted_sample_topk(spark, SF).collect()
        assert len(rows) == sampling.WSAMPLE_K
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        mean_corpus = (
            load_table(spark, SF, "documents").agg(F.avg("n_chars")).collect()[0][0]
        )
        mean_sample = sum(r.n_chars for r in rows) / len(rows)
        # length-weighted: the sample must skew long vs the corpus mean
        assert mean_sample > mean_corpus


class TestNationOls:
    def test_per_group_shape(self, spark):
        rows = profiling.q_nation_revenue_ols(spark, SF).collect()
        assert len(rows) == 25
        for r in rows:
            assert 0.0 <= r.r_sq <= 1.0
            assert r.n_orders > 0


class TestCohortLtv:
    def test_cumulative_monotone_within_cohort(self, spark):
        from collections import defaultdict

        from pgsf_spark.analytics import events as ev

        rows = ev.q_cohort_ltv(spark, SF).collect()
        assert rows
        by_cohort = defaultdict(list)
        for r in sorted(rows, key=lambda r: (r.cohort_week, r.age_week)):
            by_cohort[r.cohort_week].append(r.cum_revenue_usd)
        for seq in by_cohort.values():
            assert seq == sorted(seq)  # cumulative never decreases


class TestEventTrigrams:
    def test_topk_sorted_and_counts_positive(self, spark):
        from pgsf_spark.analytics import events as ev

        rows = ev.q_event_trigrams(spark, SF).collect()
        assert 0 < len(rows) <= ev.TRIGRAM_TOP
        ns = [r.n for r in rows]
        assert ns == sorted(ns, reverse=True)
        assert all(len(r.path.split(">")) == 3 for r in rows)


class TestAmsF2:
    def test_estimate_within_sampling_error(self, spark):
        from pgsf_spark.analytics import text as tx

        row = tx.q_ams_f2_sketch(spark, SF).collect()[0]
        assert row.exact_f2 >= row.n_tokens  # sum c^2 >= sum c
        # var of mean-of-K estimator <= 2*F2^2/K: 5 sigma bound is generous
        import math

        sigma = math.sqrt(2.0 / tx.AMS_K) * row.exact_f2
        assert abs(row.ams_f2 - row.exact_f2) < 5 * sigma


class TestLDiversity:
    def test_rollup_consistent(self, spark):
        from pgsf_spark.analytics import privacy as pv

        row = pv.q_l_diversity_audit(spark, SF).collect()[0]
        assert row.classes_below_l <= row.n_classes
        assert row.min_diversity >= 1
        assert 0.0 <= row.at_risk_pct <= 100.0


class TestBinarySegmentation:
    def test_split_interior_and_means_bracket(self, spark):
        row = profiling.q_binary_segmentation_split(spark, SF).collect()[0]
        assert 1 <= row.days_before < row.n_days
        assert row.gain_usd_sq >= 0


class TestIpwEffect:
    def test_hajek_estimate_near_zero(self, spark):
        from pgsf_spark.analytics import events as ev
        from pgsf_spark.tables import load_table

        row = ev.q_ipw_effect(spark, SF).collect()[0]
        assert 0 < row.n_treated < row.n_users
        mean_spend = (
            load_table(spark, SF, "orders")
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("s"))
            .agg(F.avg("s"))
            .collect()[0][0]
        )
        # the constructed confounding must actually bias the naive
        # difference (else the gate demonstrates nothing) ...
        assert abs(row.naive_diff_usd) > 0.1 * mean_spend
        # ... and the Hajek IPW estimate of the true-zero effect must be
        # strictly closer to zero, within sampling noise of the scale
        assert abs(row.ipw_ate_usd) < abs(row.naive_diff_usd) / 2
        assert abs(row.ipw_ate_usd) < 0.25 * mean_spend


class TestTrimmedMean:
    def test_trim_bounds_and_count(self, spark):
        from pgsf_spark.analytics import corpus as co

        rows = co.q_trimmed_mean_chars(spark, SF).collect()
        assert rows
        for r in rows:
            assert r.n_kept <= r.n_docs
            # 90% +- rounding of each source retained
            assert r.n_kept >= int(0.9 * r.n_docs) - 2


class TestMatryoshkaRecall:
    def test_recall_bounds(self, spark):
        from pgsf_spark.analytics import similarity as sim

        row = sim.q_matryoshka_recall(spark, SF).collect()[0]
        assert row.n_queries == sim.MAT_Q
        assert 0 <= row.n_hits <= sim.MAT_K * row.n_queries
        assert 0.0 <= row.recall_at_5 <= 1.0


class TestPersonalizedPagerank:
    def test_mass_concentrates_near_seeds(self, spark):
        rows = dedup.q_personalized_pagerank(spark, SF).collect()
        assert 0 < len(rows) <= dedup.PPR_TOP
        scores = [r.ppr for r in rows]
        assert scores == sorted(scores, reverse=True)
        # with teleport mass alpha, seeds dominate the top of the ranking
        assert any(r.is_seed == 1 for r in rows[:5])


class TestCohensKappa:
    def test_table_sums_and_range(self, spark):
        from pgsf_spark.analytics import curation as cu

        row = cu.q_cohens_kappa(spark, SF).collect()[0]
        assert row.n11 + row.n10 + row.n01 + row.n00 == row.n_docs
        assert -1.0 <= row.kappa <= 1.0


class TestJoinSizeEstimate:
    def test_exact_matches_real_join_and_estimate_bounded(self, spark):
        import math

        from pgsf_spark.tables import load_table

        row = profiling.q_join_size_estimate(spark, SF).collect()[0]
        ev = load_table(spark, SF, "events").select(F.col("user_id").cast("long").alias("k"))
        o = load_table(spark, SF, "orders").select(F.col("o_custkey").cast("long").alias("k"))
        assert row.exact_join_size == ev.join(o, "k").count()
        # AMS variance <= (F2(e)*F2(o) + ip^2)/K: a loose 5-sigma check
        sigma = math.sqrt(2.0 / profiling.AMS_JOIN_K) * max(
            row.exact_join_size, row.e_rows * 4, row.o_rows * 4
        )
        assert abs(row.ams_estimate - row.exact_join_size) < 5 * max(sigma, 1.0)


class TestDecileLift:
    def test_top_decile_concentrates_and_cum_lift_decays_to_one(self, spark):
        from pgsf_spark.analytics import relational as rel

        rows = sorted(rel.q_decile_lift_table(spark, SF).collect(), key=lambda r: r.decile)
        assert len(rows) == rel.LIFT_DECILES
        # cumulative lift over ALL deciles is exactly the base rate ratio = 1
        assert rows[-1].cum_lift == pytest.approx(1.0, abs=1e-6)
        assert all(r.n > 0 for r in rows)


class TestKaplanMeier:
    def test_log_survival_decreasing_and_consistent_with_hazard(self, spark):
        from pgsf_spark.analytics import events as ev

        rows = sorted(ev.q_kaplan_meier(spark, SF).collect(), key=lambda r: r.day)
        assert rows
        logs = [r.km_log_survival for r in rows]
        assert all(b <= a for a, b in zip(logs, logs[1:]))  # survival never rises
        assert all(v <= 0 for v in logs)
        # same risk-set construction as the hazard: day/d/n_risk rows match
        hz = {
            (r.day, r.d, r.n_risk)
            for r in ev.q_conversion_hazard(spark, SF).collect()
        }
        assert {(r.day, r.d, r.n_risk) for r in rows} == hz

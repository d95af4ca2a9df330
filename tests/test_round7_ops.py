"""Semantics tests for the round-7 operators (the oracle gates check
cross-engine parity; these check the MATH means what the docstrings say)."""

import pytest
from pyspark.sql import functions as F

from pgsf_spark.analytics import (
    advanced,
    corpus,
    curation,
    events,
    geo,
    linkage,
    pipeline,
    privacy,
    profiling,
    similarity,
    text,
)

SF = "/root/testdata/sf0.001"


class TestTCloseness:
    def test_emd_bounds_and_counts(self, spark):
        row = privacy.q_t_closeness_audit(spark, SF).collect()[0]
        # ordered EMD over a normalized distribution is in [0, 1]
        assert 0.0 <= row.max_emd <= 1.0
        assert 0.0 <= row.avg_emd <= row.max_emd
        assert 0 <= row.classes_above_t <= row.n_classes


class TestLogRank:
    def test_null_split_not_significant(self, spark):
        row = events.q_log_rank_test(spark, SF).collect()[0]
        # hash-randomized arms: chi2 ~ chi2(1); > 15 would be absurd
        assert row.chi_square is None or row.chi_square < 15.0
        assert row.variance is None or row.variance >= 0.0


class TestCliffsDelta:
    def test_delta_in_range(self, spark):
        row = profiling.q_cliffs_delta(spark, SF).collect()[0]
        assert -1.0 <= row.cliffs_delta <= 1.0


class TestFdViolation:
    def test_g3_bounds_and_holds_flag(self, spark):
        rows = profiling.q_fd_violation_audit(spark, SF).collect()
        assert len(rows) == len(profiling.FD_CANDIDATES)
        for r in rows:
            assert 0.0 <= r.g3 < 1.0
            assert r.holds == (r.n_violations == 0)


class TestBrier:
    def test_murphy_identity_and_bounds(self, spark):
        row = curation.q_brier_decomposition(spark, SF).collect()[0]
        assert 0.0 <= row.uncertainty <= 0.25  # p(1-p) max at 0.25
        assert row.reliability >= 0.0 and row.resolution >= 0.0
        # identity holds by construction (both faces emit it assembled)
        assert abs(row.brier_score - (row.reliability - row.resolution + row.uncertainty)) < 1e-5


class TestFleiss:
    def test_kappa_range(self, spark):
        row = curation.q_fleiss_kappa(spark, SF).collect()[0]
        assert row.fleiss_kappa is None or -1.0 <= row.fleiss_kappa <= 1.0
        assert row.n_unanimous <= row.n_docs


class TestMrr:
    def test_mrr_bounds(self, spark):
        row = similarity.q_mrr_gate(spark, SF).collect()[0]
        assert row.n_queries == similarity.MRR_Q
        assert 0.0 <= row.mrr <= 1.0
        assert row.n_hits <= row.n_queries


class TestBenjaminiHochberg:
    def test_stepup_contiguity(self, spark):
        rows = profiling.q_benjamini_hochberg(spark, SF).collect()
        assert len(rows) == profiling.BH_M
        # rejections must be a prefix of the rank order (step-up property)
        flags = [r.rejected for r in sorted(rows, key=lambda r: r.bh_rank)]
        assert flags == sorted(flags, reverse=True)


class TestHeavyHitters:
    def test_exactness_against_plain_groupby(self, spark):
        got = {
            r.token: r.exact_count
            for r in text.q_heavy_hitters_cms_verified(spark, SF).collect()
        }
        from pgsf_spark.analytics.dedup import _norm_text
        from pgsf_spark.tables import load_table

        d = load_table(spark, SF, "documents")
        truth = {
            r.token: r.n
            for r in d.select(
                F.explode(F.split(_norm_text(F.col("text")), " ")).alias("token")
            )
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got  # threshold splits the pack: some hitters exist
        for tok, cnt in got.items():
            assert truth[tok] == cnt  # exact, not estimated


class TestKnnAccuracy:
    def test_bounds(self, spark):
        row = similarity.q_knn_label_accuracy(spark, SF).collect()[0]
        assert row.n_queries == similarity.KNN_Q
        assert 0.0 <= row.accuracy <= 1.0
        assert 1.0 / similarity.KNN_K <= row.avg_winner_share <= 1.0


class TestObf:
    def test_null_experiment_never_crosses(self, spark):
        rows = events.q_obrien_fleming_looks(spark, SF).collect()
        assert len(rows) == events.OBF_K
        assert not any(r.crossed for r in rows)


class TestMad:
    def test_mad_at_most_half_range(self, spark):
        row = profiling.q_mad_robust_scale(spark, SF).collect()[0]
        assert row.mad_usd >= 0.0
        assert abs(row.robust_sigma_usd - round(1.4826 * row.mad_usd, 4)) < 0.01


class TestGraphShelf:
    def test_modularity_range(self, spark):
        row = linkage.q_graph_modularity(spark, SF).collect()[0]
        assert -1.0 <= row.modularity <= 1.0
        assert row.intra_edges <= row.n_edges

    def test_assortativity_range(self, spark):
        row = linkage.q_degree_assortativity(spark, SF).collect()[0]
        assert row.assortativity is None or -1.0 <= row.assortativity <= 1.0

    def test_bfs_reach_monotone(self, spark):
        rows = linkage.q_bfs_reachability_probe(spark, SF).collect()
        by_probe = {}
        for r in rows:
            by_probe.setdefault(r.probe, []).append(r)
        for probe, rs in by_probe.items():
            total = rs[0].total_reach
            assert sum(r.n_new for r in rs) <= total or total == 0


class TestConformal:
    def test_coverage_near_target(self, spark):
        row = profiling.q_conformal_interval_gate(spark, SF).collect()[0]
        # split-conformal guarantee: coverage within sampling noise of 0.9
        assert 0.75 <= row.coverage <= 1.0


class TestGeo:
    def test_nn_distance_within_cell_bound(self, spark):
        rows = geo.q_geo_nearest_neighbor(spark, SF).collect()
        assert rows
        for r in rows:
            if r.found:
                # candidates come from the 3x3 neighborhood of 10-degree
                # cells: the distance cannot exceed the 2-cell diagonal
                assert r.dist_deg <= (2 * geo.CELL_DEG) * (2**0.5) + 1e-6

    def test_density_cells_cover_all_points(self, spark):
        rows = geo.q_geo_density_grid(spark, SF).collect()
        assert len(rows) == geo.GEO_TOP_CELLS
        assert all(r.n_points >= 1 for r in rows)


class TestDedupWeights:
    def test_effective_never_exceeds_raw(self, spark):
        for r in pipeline.q_dedup_loss_weights(spark, SF).collect():
            assert r.effective_docs <= r.n_docs + 1e-6
            assert 0.0 < r.effective_ratio <= 1.0


class TestTopkStability:
    def test_overlap_bounds(self, spark):
        row = advanced.q_topk_stability_audit(spark, SF).collect()[0]
        assert row.n_common <= row.k
        assert row.n_same_rank <= row.n_common
        assert 0.0 <= row.jaccard <= 1.0


class TestBurstiness:
    def test_dispersion_nonnegative(self, spark):
        rows = corpus.q_token_burstiness(spark, SF).collect()
        assert rows
        for r in rows:
            assert r.dispersion is None or r.dispersion >= -1e-9
            assert r.mean_when_present >= 1.0  # present => at least one occurrence


class TestRetentionHalflife:
    def test_decay_is_negative_and_halflife_positive(self, spark):
        row = events.q_retention_halflife(spark, SF).collect()[0]
        assert row.n_ages >= 3
        # the synthetic corpus retains everyone every week: the fit must
        # say FLAT (slope 0, half-life undefined), never invent decay
        assert row.decay_slope <= 0
        assert row.halflife_weeks is None or row.halflife_weeks > 0


class TestElasticity:
    def test_r2_bounds(self, spark):
        row = profiling.q_price_elasticity_proxy(spark, SF).collect()[0]
        assert row.n_parts > 0
        assert 0.0 <= row.r_squared <= 1.0


class TestClusterQuality:
    def test_ch_positive_parts(self, spark):
        row = similarity.q_calinski_harabasz_index(spark, SF).collect()[0]
        assert row.within_ss > 0 and row.between_ss >= 0
        assert row.ch_index is None or row.ch_index >= 0

    def test_silhouette_bounds_and_panel_mean(self, spark):
        rows = similarity.q_silhouette_panel(spark, SF).collect()
        assert len(rows) == similarity.SIL_PANEL
        vals = [r.silhouette for r in rows if r.silhouette is not None]
        assert vals and all(-1.0 <= v <= 1.0 for v in vals)
        mean = rows[0].panel_mean
        assert -1.0 <= mean <= 1.0


class TestEcod:
    def test_scores_positive_and_sorted(self, spark):
        rows = similarity.q_ecod_outliers(spark, SF).collect()
        assert len(rows) == similarity.ECOD_TOP
        scores = [r.ecod_score for r in rows]
        assert all(s > 0 for s in scores)
        assert scores == sorted(scores, reverse=True)


class TestKendall:
    def test_tau_range(self, spark):
        row = profiling.q_kendall_tau_daily(spark, SF).collect()[0]
        assert row.tau_b is None or -1.0 <= row.tau_b <= 1.0


class TestMarketBasket:
    def test_rule_identities(self, spark):
        from pgsf_spark.analytics import relational

        rows = relational.q_market_basket_rules(spark, SF).collect()
        assert 0 < len(rows) <= relational.MB_TOP
        for r in rows:
            # support can never exceed confidence (n_pair/N vs n_pair/n_ant)
            assert 0.0 < r.support <= r.confidence <= 1.0
            assert r.support >= relational.MB_MIN_SUPPORT - 1e-9
            assert r.lift > 0.0
            assert r.antecedent != r.consequent
        lifts = [r.lift for r in rows]
        assert lifts == sorted(lifts, reverse=True)

    def test_direction_pairing(self, spark):
        from pgsf_spark.analytics import relational

        # both directions of a pair share n_pair and support
        rows = relational.q_market_basket_rules(spark, SF).collect()
        by_pair = {}
        for r in rows:
            by_pair.setdefault(frozenset((r.antecedent, r.consequent)), []).append(r)
        for pair_rows in by_pair.values():
            assert len({r.n_pair for r in pair_rows}) == 1


class TestPmi:
    def test_counts_respect_floor_and_order(self, spark):
        rows = corpus.q_pmi_collocations(spark, SF).collect()
        assert 0 < len(rows) <= corpus.PMI_TOP
        assert all(r.n_bigram >= corpus.PMI_MIN_COUNT for r in rows)
        pmis = [r.pmi for r in rows]
        assert pmis == sorted(pmis, reverse=True)

    def test_pmi_matches_handcount(self, spark):
        # hand-check one reported bigram against direct counts
        from pgsf_spark.tables import load_table
        import math

        rows = corpus.q_pmi_collocations(spark, SF).collect()
        r = rows[0]
        d = load_table(spark, SF, "documents")
        toks = d.select(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
        )
        uni = toks.select(F.explode("t").alias("w"))
        nu = uni.count()
        c1 = uni.filter(F.col("w") == r.w1).count()
        c2 = uni.filter(F.col("w") == r.w2).count()
        pmi = math.log(
            ((r.n_bigram / rows_total_bigrams(toks)) * (nu / c1)) * (nu / c2)
        )
        assert abs(pmi - r.pmi) < 1e-5


def rows_total_bigrams(toks):
    return (
        toks.select((F.greatest(F.size("t") - 1, F.lit(0))).alias("k"))
        .agg(F.sum("k"))
        .collect()[0][0]
    )


class TestRunsTest:
    def test_counts_and_bounds(self, spark):
        row = profiling.q_runs_test_daily(spark, SF).collect()[0]
        assert row.n_days == row.n_above + row.n_below
        # runs are bounded by 1..n and by the two-class structure
        assert 1 <= row.runs <= row.n_days
        assert row.runs <= 2 * min(row.n_above, row.n_below) + 1
        # strict > median split: above <= below (ties go below)
        assert row.n_above <= row.n_below
        # null (random) series: |z| beyond 10 would be absurd
        assert row.z_score is None or abs(row.z_score) < 10.0


class TestJackknife:
    def test_se_nonnegative_and_mean_sane(self, spark):
        row = profiling.q_jackknife_se_nation(spark, SF).collect()[0]
        assert row.n_nations == 25
        assert row.jackknife_se >= 0.0
        # grouped jackknife bias of a linear statistic is ~0
        assert abs(row.jackknife_bias) < row.mean_order_value * 0.1
        assert row.mean_order_value > 0


class TestLjungBox:
    def test_q_nonnegative_and_flag_consistent(self, spark):
        row = profiling.q_ljung_box_stat(spark, SF).collect()[0]
        assert row.n_lags == profiling.LB_LAGS
        assert row.q_stat >= 0.0
        assert row.reject_whiteness == (row.q_stat > profiling.LB_CRIT)

    def test_matches_acf_by_hand(self, spark):
        # Q recomputed from the ACF gate's own rho values (lags 1..6)
        acf = {
            r.lag: r.acf
            for r in profiling.q_acf_daily_revenue(spark, SF).collect()
        }
        row = profiling.q_ljung_box_stat(spark, SF).collect()[0]
        n = row.n_days
        q = n * (n + 2) * sum(
            acf[k] ** 2 / (n - k) for k in range(1, profiling.LB_LAGS + 1)
        )
        assert abs(q - row.q_stat) < 0.01


class TestYuleK:
    def test_k_positive_and_per_source(self, spark):
        rows = corpus.q_yule_k_lexical(spark, SF).collect()
        assert len(rows) == 20  # the synthetic corpus's source count
        for r in rows:
            assert r.n_types <= r.n_tokens
            # K > 0 whenever any token repeats
            assert r.yule_k > 0.0


class TestShapley:
    def test_efficiency_axiom(self, spark):
        # sum of Shapley values == v(full) - v(empty), exactly (x24 ints)
        from pgsf_spark.tables import load_table

        rows = events.q_shapley_attribution(spark, SF).collect()
        assert len(rows) == 4
        total24 = sum(r.phi24 for r in rows)
        ev = load_table(spark, SF, "events")
        flags = ev.groupBy("user_id").agg(
            F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
            F.max((F.col("event_type") != "purchase").cast("int")).alias("touched"),
        )
        v_full = flags.filter(F.col("conv") == 1).count()
        v_empty = (
            flags.filter((F.col("conv") == 1) & (F.col("touched") == 0)).count()
        )
        assert total24 == 24 * (v_full - v_empty)

    def test_shares_sum_to_one(self, spark):
        rows = events.q_shapley_attribution(spark, SF).collect()
        shares = [r.share for r in rows if r.share is not None]
        if shares:
            assert abs(sum(shares) - 1.0) < 1e-4


class TestNelsonAalen:
    def test_monotone_and_bounds_km(self, spark):
        rows = events.q_nelson_aalen_hazard(spark, SF).collect()
        assert rows
        hz = [r.cum_hazard for r in rows]
        assert hz == sorted(hz)
        assert all(h > 0 for h in hz)
        vs = [r.hazard_var for r in rows]
        assert vs == sorted(vs)
        # -ln S_KM(t) >= H_NA(t) pointwise (ln(1-x) <= -x)
        km = {r.day: r.km_log_survival for r in events.q_kaplan_meier(spark, SF).collect()}
        for r in rows:
            assert -km[r.day] >= r.cum_hazard - 1e-6


class TestRandomizationTest:
    def test_p_value_bounds_and_tail(self, spark):
        row = corpus.q_randomization_test_chars(spark, SF).collect()[0]
        assert row.n_replicates == corpus.MCRT_K
        assert 0 <= row.n_extreme <= corpus.MCRT_K
        lo = 1.0 / (corpus.MCRT_K + 1)
        assert lo - 1e-9 <= row.p_value <= 1.0
        # add-one identity
        assert abs(row.p_value - (1 + row.n_extreme) / (corpus.MCRT_K + 1)) < 1e-6


class TestReadability:
    def test_count_identities_and_score_ranges(self, spark):
        rows = corpus.q_readability_panel(spark, SF).collect()
        assert len(rows) == 20
        for r in rows:
            # >= 1 sentence and >= 1 syllable per word by construction
            assert r.sentences >= r.n_docs
            assert r.syllables >= r.words
            # sane screen range for English-ish synthetic text
            assert -200.0 < r.flesch_reading_ease < 207.0
            assert -16.0 < r.fk_grade < 60.0


class TestDurbinWatson:
    def test_range_and_acf_consistency(self, spark):
        row = profiling.q_durbin_watson(spark, SF).collect()[0]
        assert 0.0 <= row.durbin_watson <= 4.0
        # DW ~ 2(1 - r1): check against the ACF gate's lag-1 value
        acf1 = {
            r.lag: r.acf for r in profiling.q_acf_daily_revenue(spark, SF).collect()
        }[1]
        assert abs(row.durbin_watson - 2.0 * (1.0 - acf1)) < 0.05


class TestTransitionEntropy:
    def test_information_inequalities(self, spark):
        import math

        row = events.q_transition_entropy(spark, SF).collect()[0]
        # 0 <= H(Y|X) <= H(Y) <= ln(5 event types)
        assert 0.0 <= row.h_next_given_current <= row.h_next + 1e-9
        assert row.h_next <= math.log(5) + 1e-9
        assert 0.0 <= row.uncertainty_coefficient <= 1.0


class TestMcnemar:
    def test_table_and_chi2(self, spark):
        from pgsf_spark.tables import load_table

        row = corpus.q_mcnemar_filters(spark, SF).collect()[0]
        n = row.both_pass + row.only_chars + row.only_tokens + row.both_fail
        assert n == load_table(spark, SF, "documents").count()
        b, c = row.only_chars, row.only_tokens
        if b + c:
            assert abs(row.mcnemar_chi2 - (b - c) ** 2 / (b + c)) < 1e-6
        assert 0.0 <= row.agreement <= 1.0


class TestHeapsLaw:
    def test_beta_in_sublinear_band(self, spark):
        row = corpus.q_heaps_law_fit(spark, SF).collect()[0]
        assert row.n_sources == 20
        # vocabulary growth must be positive and sub-linear
        assert 0.0 < row.heaps_beta <= 1.0
        assert 0.0 <= row.r_squared <= 1.0


class TestPettitt:
    def test_k_bounds_and_logp(self, spark):
        row = profiling.q_pettitt_changepoint(spark, SF).collect()[0]
        n = row.n_days
        # |U_t| is bounded by the total pair count
        assert 0 <= row.k_stat <= n * (n - 1)
        assert row.ln_approx_p <= 0.0
        assert row.change_day is not None

    def test_u_is_cumsum_of_mk_scores(self, spark):
        # the antisymmetry collapse: U_t == cumsum(s_i); re-derive K at
        # a coarse month grain to keep the check cheap and independent
        from pgsf_spark.tables import load_table

        daily = (
            load_table(spark, SF, "orders")
            .groupBy(F.to_date("o_orderdate").alias("day"))
            .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x"))
            .collect()
        )
        xs = [r.x for r in sorted(daily, key=lambda r: r.day)]
        n = len(xs)
        cum = 0
        sgn = lambda a, b: (a > b) - (a < b)
        row_scores = [sum(sgn(xi, xj) for xj in xs) for xi in xs]
        ks = []
        for t in range(n):
            cum += row_scores[t]
            ks.append(abs(cum))
        row = profiling.q_pettitt_changepoint(spark, SF).collect()[0]
        assert row.k_stat == max(ks)


class TestJarqueBera:
    def test_flag_and_moment_sanity(self, spark):
        row = profiling.q_jarque_bera_daily(spark, SF).collect()[0]
        assert row.jb_stat >= 0.0
        assert row.reject_normality == (row.jb_stat > profiling.JB_CRIT)
        assert abs(row.skewness) < 10 and row.excess_kurtosis > -3.0


class TestSourceHhi:
    def test_bounds_and_reciprocal(self, spark):
        row = corpus.q_source_hhi(spark, SF).collect()[0]
        g = row.n_sources
        for hhi, eff in (
            (row.hhi_docs, row.effective_sources_docs),
            (row.hhi_tokens, row.effective_sources_tokens),
        ):
            assert 1.0 / g - 1e-9 <= hhi <= 1.0
            assert 1.0 <= eff <= g + 1e-6
            assert abs(eff - 1.0 / hhi) < 1e-3


class TestPriceIndex:
    def test_index_identities(self, spark):
        from pgsf_spark.analytics import relational

        row = relational.q_price_index_fisher(spark, SF).collect()[0]
        assert row.n_parts > 0
        for v in (row.laspeyres, row.paasche, row.fisher):
            assert v > 0.0
        # Fisher is the geometric mean: strictly between (or equal to) both
        lo, hi = sorted((row.laspeyres, row.paasche))
        assert lo - 1e-6 <= row.fisher <= hi + 1e-6


class TestInterarrivalBurstiness:
    def test_bounds(self, spark):
        row = events.q_interarrival_burstiness(spark, SF).collect()[0]
        assert row.n_gaps > 0
        assert row.mean_gap_s > 0 and row.sd_gap_s >= 0
        assert -1.0 <= row.burstiness_b <= 1.0
        assert row.cv_squared >= 0.0


class TestEffectiveRank:
    def test_rank_bounds(self, spark):
        row = similarity.q_embedding_effective_rank(spark, SF).collect()[0]
        # PR is between 1 and the ambient dimension
        assert 1.0 - 1e-6 <= row.effective_rank <= 64.0 + 1e-6
        assert row.trace > 0 and row.frobenius_sq > 0


class TestNoveltyCurve:
    def test_monotone_structure(self, spark):
        rows = corpus.q_corpus_novelty_curve(spark, SF).collect()
        assert [r.bucket for r in rows] == list(range(corpus.CURVE_BUCKETS))
        # bucket 0 is 100% novel by construction
        assert rows[0].novelty_rate == 1.0
        for r in rows:
            assert 0 <= r.novel_grams <= r.distinct_grams


class TestCramerVonMises:
    def test_nonnegative_and_null_small(self, spark):
        row = profiling.q_cramer_von_mises(spark, SF).collect()[0]
        assert row.cvm_stat >= 0.0
        # null (time-split) comparison on a stationary synthetic series:
        # E[T] ~ 1/6 + 1/(6(m+n)); > 5 would be an absurd drift claim
        assert row.cvm_stat < 5.0
        assert row.n_first_half > 0 and row.n_second_half > 0


class TestHampel:
    def test_counts_and_ratio(self, spark):
        row = profiling.q_hampel_outlier_days(spark, SF).collect()[0]
        assert row.n_outliers <= row.n_days_checked
        assert row.max_deviation_ratio is None or row.max_deviation_ratio >= 0.0
        # interior days only: checked = n_days - 2 * HALF on a gapless spine
        from pgsf_spark.tables import load_table

        n_days = (
            load_table(spark, SF, "orders")
            .select(F.to_date("o_orderdate").alias("d"))
            .distinct()
            .count()
        )
        assert row.n_days_checked <= n_days


class TestNegativeBinomial:
    def test_moment_identities(self, spark):
        row = events.q_negative_binomial_fit(spark, SF).collect()[0]
        assert row.n_users > 0
        assert row.var_events >= 0.0
        if row.nb_r is not None:
            assert row.nb_r > 0 and 0.0 < row.nb_p < 1.0
            # MoM identity: mu == r(1-p)/p
            mu_back = row.nb_r * (1 - row.nb_p) / row.nb_p
            assert abs(mu_back - row.mean_events) / row.mean_events < 0.01


class TestCharEntropy:
    def test_entropy_bounds(self, spark):
        import math

        rows = corpus.q_char_entropy_bits(spark, SF).collect()
        assert len(rows) == 20
        for r in rows:
            # 0 <= H <= log2(alphabet size)
            assert 0.0 <= r.entropy_bits_per_char <= math.log2(r.n_distinct_chars) + 1e-6
            assert r.n_distinct_chars <= r.n_chars


class TestShipLatency:
    def test_order_statistics(self, spark):
        from pgsf_spark.analytics import relational

        rows = relational.q_ship_latency_profile(spark, SF).collect()
        assert len(rows) == 5  # five priorities
        for r in rows:
            assert 0 <= r.p50_days <= r.p90_days <= r.max_days
            assert 0.0 <= r.mean_days <= r.max_days


class TestWilson:
    def test_interval_contains_rate(self, spark):
        rows = curation.q_wilson_pass_rate_ci(spark, SF).collect()
        assert len(rows) == 20
        for r in rows:
            assert 0.0 <= r.wilson_lo <= r.pass_rate <= r.wilson_hi <= 1.0
            # Wilson interval is never degenerate on a finite sample
            assert r.wilson_hi - r.wilson_lo > 0.0


class TestInequality:
    def test_index_bounds_and_mean_order(self, spark):
        row = profiling.q_theil_atkinson_inequality(spark, SF).collect()[0]
        assert row.theil_t >= 0.0
        assert 0.0 <= row.atkinson_2 < 1.0
        # AM-HM inequality
        assert row.harmonic_mean_spend <= row.mean_spend + 1e-6


class TestGrowthProfile:
    def test_bounds(self, spark):
        row = profiling.q_daily_growth_profile(spark, SF).collect()[0]
        assert row.n_growth_days > 0
        assert 0.0 <= row.up_share <= 1.0
        assert 0.0 <= row.max_drawdown < 1.0
        assert row.median_growth > -1.0


class TestHourlyUniformity:
    def test_chi2_and_counts(self, spark):
        row = events.q_hourly_uniformity_chi2(spark, SF).collect()[0]
        assert row.chi_square >= 0.0
        assert row.dof == 23
        assert row.trough_count <= row.peak_count
        assert row.peak_trough_ratio >= 1.0


class TestRbo:
    def test_rbo_bounds_vs_overlap(self, spark):
        row = advanced.q_rbo_topk_stability(spark, SF).collect()[0]
        assert 0.0 <= row.rbo <= 1.0
        assert 0 <= row.overlap_at_k <= row.k
        # identical lists would give truncated-RBO = 1 - p^K; any
        # disagreement keeps it strictly under that ceiling
        ceiling = 1 - advanced.RBO_P**advanced.RBO_K
        assert row.rbo <= ceiling + 1e-9


class TestJamesStein:
    def test_shrinkage_direction(self, spark):
        rows = profiling.q_james_stein_nation_means(spark, SF).collect()
        assert len(rows) == 25
        c = rows[0].shrinkage_c
        assert 0.0 <= c <= 1.0
        assert all(abs(r.shrinkage_c - c) < 1e-9 for r in rows)
        # every shrunk mean lies between its raw mean and the grand mean
        grand = sum(r.raw_mean * r.n_orders for r in rows) / sum(
            r.n_orders for r in rows
        )
        for r in rows:
            lo, hi = sorted((r.raw_mean, grand))
            assert lo - 1e-4 <= r.js_mean <= hi + 1e-4


class TestGoodTuring:
    def test_mass_and_smoothing(self, spark):
        rows = corpus.q_good_turing_unseen(spark, SF).collect()
        assert [r.r for r in rows] == list(range(1, corpus.GT_MAX_R + 1))
        r1 = rows[0]
        assert r1.p_unseen is not None and 0.0 <= r1.p_unseen < 1.0
        assert abs(r1.p_unseen - r1.v_r / r1.n_tokens) < 1e-6
        # V_r columns chain: v_r_plus_1 of row r == v_r of row r+1
        for a, b in zip(rows, rows[1:]):
            assert a.v_r_plus_1 == b.v_r


class TestPrAuc:
    def test_ap_bounds_and_skill(self, spark):
        row = curation.q_pr_auc_quality(spark, SF).collect()[0]
        # AP is bounded by [~base_rate for a random ranker, 1.0]
        assert 0.0 <= row.average_precision <= 1.0
        assert 0.0 < row.base_rate < 1.0
        assert row.n_pos > 0 and row.n_neg > 0


class TestBestF1:
    def test_operating_point_identities(self, spark):
        row = curation.q_best_f1_threshold(spark, SF).collect()[0]
        assert row.tp <= min(row.n_predicted_pos, row.n_pos)
        p, r = row.precision, row.recall
        assert 0.0 < p <= 1.0 and 0.0 < r <= 1.0
        # F1 is the harmonic mean of the reported precision/recall
        assert abs(row.f1 - 2 * p * r / (p + r)) < 1e-4


class TestBradleyTerry:
    def test_strengths_normalized_and_order(self, spark):
        rows = events.q_bradley_terry_strengths(spark, SF).collect()
        assert len(rows) == len(events.BT_TYPES)
        s = sum(r.bt_strength for r in rows)
        assert abs(s - 1.0) < 1e-6
        assert all(r.bt_strength > 0 for r in rows)
        # MM preserves win-count order on this aggregated design
        by_wins = sorted(rows, key=lambda r: -r.n_wins)
        by_strength = sorted(rows, key=lambda r: -r.bt_strength)
        assert [r.event_type for r in by_wins] == [
            r.event_type for r in by_strength
        ]


class TestDpoPairs:
    def test_pair_hygiene(self, spark):
        rows = pipeline.q_dpo_preference_pairs(spark, SF).collect()
        assert rows
        for r in rows:
            assert r.chosen_doc != r.rejected_doc
            assert r.margin == r.chosen_chars - r.rejected_chars
            assert r.margin >= pipeline.DPO_MARGIN


class TestKneserNey:
    def test_boundness_and_floors(self, spark):
        rows = corpus.q_kneser_ney_continuation(spark, SF).collect()
        assert 0 < len(rows) <= corpus.KN_TOP
        bounds = [r.context_boundness for r in rows]
        assert bounds == sorted(bounds, reverse=True)
        for r in rows:
            assert r.n_occurrences >= corpus.KN_MIN
            assert 1 <= r.n_left_contexts
            assert r.raw_share > 0 and r.continuation_share > 0


class TestBurrowsDelta:
    def test_pairs_and_nonnegativity(self, spark):
        rows = corpus.q_burrows_delta(spark, SF).collect()
        assert len(rows) == corpus.BD_PAIRS
        deltas = [r.delta for r in rows]
        assert deltas == sorted(deltas)
        for r in rows:
            assert r.source_a < r.source_b
            assert r.n_terms == corpus.BD_TOP
            assert r.delta >= 0.0


class TestQuantileNormalization:
    def test_ladder_monotone(self, spark):
        rows = curation.q_quantile_normalization_map(spark, SF).collect()
        assert len(rows) == 20 * curation.QN_Q
        by_src = {}
        for r in rows:
            by_src.setdefault(r.source, []).append(r)
        for src, rs in by_src.items():
            rs.sort(key=lambda r: r.q)
            sv = [r.source_value for r in rs]
            gv = [r.global_value for r in rs]
            assert sv == sorted(sv) and gv == sorted(gv)
            for r in rs:
                assert r.shift == r.global_value - r.source_value


class TestAucByFold:
    def test_folds_and_spread(self, spark):
        rows = curation.q_auc_by_fold(spark, SF).collect()
        assert len(rows) == curation.AUCF_K
        aucs = [r.auc for r in rows]
        assert all(0.0 <= a <= 1.0 for a in aucs)
        mean = rows[0].mean_auc
        assert abs(mean - sum(aucs) / len(aucs)) < 1e-4
        assert rows[0].sd_auc >= 0.0
        # each fold's AUC should be near the pooled single-number gate
        pooled = curation.q_roc_auc_quality(spark, SF).collect()[0].auc
        assert all(abs(a - pooled) < 0.2 for a in aucs)


class TestDupClusterPowerlaw:
    def test_counts_consistent_with_clusters(self, spark):
        from pgsf_spark.analytics import dedup

        row = dedup.q_dup_cluster_powerlaw(spark, SF).collect()[0]
        assert row.n_clusters >= 0
        if row.n_clusters:
            assert row.max_size >= dedup.DCP_SMIN
            assert row.n_docs_clustered >= row.n_clusters * dedup.DCP_SMIN
            assert row.alpha_mle is None or row.alpha_mle > 1.0


class TestRichClub:
    def test_phi_bounds_and_monotone_nodes(self, spark):
        rows = linkage.q_rich_club_coefficient(spark, SF).collect()
        assert [r.k for r in rows] == linkage.RC_KS
        # node counts shrink as the threshold rises
        ns = [r.n_nodes for r in rows]
        assert ns == sorted(ns, reverse=True)
        for r in rows:
            assert r.phi is None or 0.0 <= r.phi <= 1.0
            max_e = r.n_nodes * (r.n_nodes - 1) // 2
            assert r.n_edges <= max_e or r.n_nodes == 0


class TestShardRebalance:
    def test_consistent_beats_modulo(self, spark):
        row = pipeline.q_shard_rebalance_audit(spark, SF).collect()[0]
        # modulo resize moves ~(N2-1)/N2 of docs; the ring moves ~1/N2
        assert row.mod_moved_frac > 0.7
        assert row.ring_moved_frac < 0.4
        assert row.ring_moved_frac < row.mod_moved_frac
        assert row.mod_moved + row.ring_moved <= 2 * row.n_docs

    def test_ring_points_structure(self):
        from pgsf_spark.analytics.pipeline import (
            SHARD_N1,
            SHARD_N2,
            SHARD_VNODES,
            _ring_points,
        )

        r1, r2 = _ring_points(SHARD_N1), _ring_points(SHARD_N2)
        assert len(r1) == SHARD_N1 * SHARD_VNODES
        assert len(r2) == SHARD_N2 * SHARD_VNODES
        # growing the cluster only ADDS points: r1 is a subset of r2
        assert set(r1) <= set(r2)
        assert all(0 <= p % 64 < SHARD_N2 for p in r2)


class TestSimpsonProbe:
    def test_counts_and_slope_band(self, spark):
        row = profiling.q_simpson_paradox_probe(spark, SF).collect()[0]
        assert row.n_nations == 25
        assert 0 <= row.n_opposite_sign <= row.n_nations
        assert row.min_nation_slope <= row.pooled_slope <= row.max_nation_slope


class TestHllMerge:
    def test_monotone_and_accurate(self, spark):
        rows = profiling.q_hll_merge_by_day(spark, SF).collect()
        assert len(rows) >= 25  # a month of days
        ex = [r.exact_cumulative for r in rows]
        est = [r.hll_estimate for r in rows]
        # cumulative merge: both sides monotone nondecreasing
        assert ex == sorted(ex)
        assert all(b >= a - 1e-9 for a, b in zip(est, est[1:]))
        # 64 registers: ~13% standard error in the raw regime; below
        # 2.5m the raw estimate is known-biased (flagged, not asserted)
        for r in rows:
            if r.raw_regime:
                assert abs(r.rel_error) < 0.5
        # the last day must agree with the single-shot HLL gate
        one = profiling.q_hll_portable(spark, SF).collect()[0]
        assert abs(rows[-1].hll_estimate - one.hll_estimate) < 1e-6


class TestMedianCi:
    def test_bracket_contains_median(self, spark):
        row = profiling.q_median_ci_order_stats(spark, SF).collect()[0]
        assert row.ci95_lo_usd <= row.median_usd <= row.ci95_hi_usd
        assert row.n_orders > 0
        # exact-median cross-check against the refinement gate's device:
        # bracket width shrinks as ~1/sqrt(n), must be a tight band here
        assert (row.ci95_hi_usd - row.ci95_lo_usd) / row.median_usd < 0.25


class TestCorrelationMatrix:
    def test_pairs_and_bounds(self, spark):
        rows = profiling.q_lineitem_correlation_matrix(spark, SF).collect()
        assert len(rows) == 6
        seen = set()
        for r in rows:
            assert r.pearson_r is None or -1.0 <= r.pearson_r <= 1.0
            # upper triangle in CORR_COLS order, no dupes
            ix = profiling.CORR_COLS.index
            assert ix(r.col_a) < ix(r.col_b)
            seen.add((r.col_a, r.col_b))
        assert len(seen) == 6
        # this synthetic corpus draws the measures independently: every
        # correlation must be near zero (|r| > 0.3 would mean the moment
        # algebra is broken, not that the data is interesting)
        assert all(abs(r.pearson_r) < 0.3 for r in rows)


class TestGTest:
    def test_g_close_to_pearson_on_null_grid(self, spark):
        row = profiling.q_g_test_independence(spark, SF).collect()[0]
        chi = profiling.q_chi_square_independence(spark, SF).collect()[0]
        assert row.g_stat >= 0.0
        assert row.mutual_information_nats >= 0.0
        # G and Pearson chi2 agree to first order on the same table
        assert abs(row.g_stat - chi.chi_square) < 0.35 * max(chi.chi_square, 1.0)


class TestChi2Residuals:
    def test_topk_ordering_and_identity(self, spark):
        rows = profiling.q_chi2_residuals_topk(spark, SF).collect()
        assert len(rows) == profiling.CHI2_RES_TOP
        mags = [abs(r.std_residual) for r in rows]
        assert mags == sorted(mags, reverse=True)
        for r in rows:
            got = (r.observed - r.expected) / (r.expected ** 0.5)
            assert abs(got - r.std_residual) < 1e-4


class TestAbEffectSize:
    def test_null_split_small_effect(self, spark):
        row = events.q_ab_effect_size(spark, SF).collect()[0]
        # hash-null split with ~15 users at this SF: sd(d) ~ sqrt(4/n),
        # so |d| beyond ~4 sigma would mean broken moment algebra
        assert abs(row.cohens_d) < 2.0
        assert abs(row.hedges_g) <= abs(row.cohens_d) + 1e-9
        assert row.mde_spend > 0


class TestTost:
    def test_flag_consistent_with_zs(self, spark):
        row = events.q_ab_equivalence_tost(spark, SF).collect()[0]
        assert row.margin > 0
        want = row.z_lower > 1.644854 and row.z_upper > 1.644854
        assert row.equivalent == want
        # z_lower + z_upper == 2 * margin / se by construction
        assert row.z_lower + row.z_upper > 0 or not row.equivalent


class TestConversionPaths:
    def test_shares_and_order(self, spark):
        rows = events.q_conversion_paths_topk(spark, SF).collect()
        assert 0 < len(rows) <= events.PATHS_TOP
        counts = [r.n_conversions for r in rows]
        assert counts == sorted(counts, reverse=True)
        assert sum(r.share for r in rows) <= 1.0 + 1e-6
        # a purchase step cannot precede the FIRST purchase
        for r in rows:
            assert r.step1 != "purchase" and r.step2 != "purchase"


class TestSaltedAggregate:
    def test_salting_is_lossless(self, spark):
        from pgsf_spark.analytics import relational

        rows = relational.q_salted_aggregate_gate(spark, SF).collect()
        assert len(rows) == 3  # A/N/R
        for r in rows:
            assert r.match is True
            assert r.direct_cents == r.salted_cents
            assert 1 <= r.n_salts <= relational.SALT_N


class TestReorderInterval:
    def test_order_statistics(self, spark):
        from pgsf_spark.analytics import relational

        row = relational.q_reorder_interval_profile(spark, SF).collect()[0]
        assert row.n_gaps > 0
        assert 0 <= row.p50_days <= row.p90_days <= row.max_days
        assert 0.0 < row.mean_days <= row.max_days


class TestRevenueConcentration:
    def test_share_bounds(self, spark):
        from pgsf_spark.analytics import relational

        row = relational.q_revenue_concentration_topk(spark, SF).collect()[0]
        assert row.k == min(relational.CONC_TOPK, row.n_customers)
        # top-k share must be at least k/n (top-k beats average) and <= 1
        lo = row.k / row.n_customers
        assert lo - 1e-9 <= row.top_share <= 1.0


class TestPriceVarianceDecomposition:
    def test_eta_bounds(self, spark):
        from pgsf_spark.analytics import relational

        row = relational.q_price_variance_decomposition(spark, SF).collect()[0]
        assert row.n_brands == 25
        assert 0.0 <= row.eta_squared <= 1.0
        assert row.f_stat is None or row.f_stat >= 0.0


class TestDimCorrelation:
    def test_corr_bounds_and_order(self, spark):
        rows = similarity.q_embedding_dim_correlation_topk(spark, SF).collect()
        assert len(rows) == similarity.DIMCORR_TOP
        mags = [abs(r.corr) for r in rows]
        assert mags == sorted(mags, reverse=True)
        for r in rows:
            assert -1.0 <= r.corr <= 1.0
            assert 0 <= r.dim_i < r.dim_j < 64


class TestDupRateBySource:
    def test_rates_and_counts(self, spark):
        from pgsf_spark.analytics import dedup

        rows = dedup.q_dup_rate_by_source(spark, SF).collect()
        assert len(rows) == 20
        for r in rows:
            assert 0 <= r.n_redundant <= r.n_in_dup_groups <= r.n_docs
            assert 0.0 <= r.redundant_rate <= r.dup_rate <= 1.0


class TestBrandShareShift:
    def test_delta_identity_and_order(self, spark):
        from pgsf_spark.analytics import relational

        rows = relational.q_brand_share_shift(spark, SF).collect()
        assert len(rows) == relational.SHIFT_TOP
        mags = [abs(r.share_delta) for r in rows]
        assert mags == sorted(mags, reverse=True)
        for r in rows:
            assert 0.0 <= r.share_first_half <= 1.0
            assert 0.0 <= r.share_second_half <= 1.0
            assert abs(r.share_delta - (r.share_second_half - r.share_first_half)) < 2e-6


class TestDiscountImpact:
    def test_accounting_identity(self, spark):
        from pgsf_spark.analytics import relational

        rows = relational.q_discount_impact_by_brand(spark, SF).collect()
        assert len(rows) == 25
        for r in rows:
            assert abs(r.net_usd - (r.gross_usd - r.discount_usd)) < 0.02
            assert 0.0 <= r.effective_discount_rate <= 0.2


class TestSupplierHhi:
    def test_bounds(self, spark):
        from pgsf_spark.analytics import relational

        rows = relational.q_supplier_hhi_by_nation(spark, SF).collect()
        assert rows
        for r in rows:
            assert 1.0 / r.n_suppliers - 1e-9 <= r.hhi <= 1.0
            assert 1.0 <= r.effective_suppliers <= r.n_suppliers + 1e-6


class TestSessionDepth:
    def test_consistency_with_sessionize(self, spark):
        row = events.q_session_depth_profile(spark, SF).collect()[0]
        n_sessions = events.q_sessionize(spark, SF).count()
        assert row.n_sessions == n_sessions
        assert 1 <= row.p50_depth <= row.p90_depth <= row.max_depth
        assert 0.0 <= row.bounce_share <= 1.0


class TestBasketSize:
    def test_order_statistics(self, spark):
        from pgsf_spark.analytics import relational
        from pgsf_spark.tables import load_table

        row = relational.q_basket_size_profile(spark, SF).collect()[0]
        n_orders = (
            load_table(spark, SF, "lineitem").select("l_orderkey").distinct().count()
        )
        assert row.n_orders == n_orders
        assert 1 <= row.p50_lines <= row.p90_lines <= row.max_lines
        assert 0.0 <= row.single_line_share <= 1.0


class TestOrthographicProfile:
    def test_shares_bounded(self, spark):
        rows = corpus.q_orthographic_profile(spark, SF).collect()
        assert len(rows) == 20
        for r in rows:
            for v in (r.digit_share, r.upper_share, r.punct_share):
                assert 0.0 <= v <= 1.0
            assert r.digit_share + r.upper_share + r.punct_share <= 1.0


class TestStopwordRatio:
    def test_share_bounds(self, spark):
        rows = corpus.q_stopword_ratio_by_source(spark, SF).collect()
        assert len(rows) == 20
        for r in rows:
            assert 0 <= r.n_stopwords <= r.n_tokens
            assert 0.0 <= r.stopword_share <= 1.0


class TestContextFill:
    def test_budget_identities(self, spark):
        rows = pipeline.q_context_fill_efficiency(spark, SF).collect()
        assert [r.ctx_len for r in rows] == pipeline.CTX_LENGTHS
        for r in rows:
            assert r.kept_tokens <= r.total_tokens
            assert 0.0 <= r.truncated_share <= 1.0
            assert 0.0 < r.pack_fill_ratio <= 1.0
            # packs must hold exactly the kept tokens
            assert (r.n_packs - 1) * r.ctx_len < r.kept_tokens <= r.n_packs * r.ctx_len
        # a larger window keeps at least as many tokens
        kept = [r.kept_tokens for r in rows]
        assert kept == sorted(kept)


class TestNormProfile:
    def test_ordering_and_bounds(self, spark):
        rows = similarity.q_embedding_norm_profile(spark, SF).collect()
        assert rows
        for r in rows:
            assert r.min_norm <= r.p50_norm <= r.max_norm
            assert r.min_norm <= r.mean_norm <= r.max_norm
            assert r.min_norm >= 0.0


class TestErrorRateExtremes:
    def test_ordering_and_context(self, spark):
        rows = events.q_error_rate_daily_extremes(spark, SF).collect()
        assert 0 < len(rows) <= events.ERR_TOP_DAYS
        rates = [r.error_rate for r in rows]
        assert rates == sorted(rates, reverse=True)
        for r in rows:
            assert r.n_errors <= r.n_events
            # the worst days sit at or above the overall rate
            assert r.error_rate >= r.overall_rate - 1e-9 or len(rows) < events.ERR_TOP_DAYS


class TestIqrByNation:
    def test_quartile_order(self, spark):
        from pgsf_spark.analytics import relational

        rows = relational.q_order_value_iqr_by_nation(spark, SF).collect()
        assert len(rows) == 25
        for r in rows:
            assert r.p25_usd <= r.p50_usd <= r.p75_usd
            assert abs(r.iqr_usd - round(r.p75_usd - r.p25_usd, 2)) < 0.02


class TestPartSourcing:
    def test_histogram_sums(self, spark):
        from pgsf_spark.analytics import relational
        from pgsf_spark.tables import load_table

        rows = relational.q_part_sourcing_profile(spark, SF).collect()
        assert rows
        n_parts_hist = sum(r.n_parts for r in rows)
        n_parts = (
            load_table(spark, SF, "lineitem").select("l_partkey").distinct().count()
        )
        assert n_parts_hist == n_parts
        assert abs(sum(r.share for r in rows) - 1.0) < 1e-4


class TestUserRecency:
    def test_band_nesting(self, spark):
        row = events.q_user_recency_segments(spark, SF).collect()[0]
        assert 0 <= row.active_7d <= row.active_30d <= row.n_users
        assert row.dormant == row.n_users - row.active_30d
        assert row.active_7d_share <= row.active_30d_share


class TestTransitionLift:
    def test_lift_positive_and_ordered(self, spark):
        rows = events.q_transition_lift_topk(spark, SF).collect()
        assert 0 < len(rows) <= events.TLIFT_TOP
        devs = [abs(r.lift - 1) for r in rows]
        assert devs == sorted(devs, reverse=True)
        assert all(r.lift > 0 for r in rows)


class TestSpendDrift:
    def test_partition_of_customers(self, spark):
        from pgsf_spark.analytics import relational

        row = relational.q_customer_spend_drift(spark, SF).collect()[0]
        assert (
            row.active_both_halves + row.first_half_only + row.second_half_only
            == row.n_customers
        )
        assert 0 <= row.growing <= row.active_both_halves
        assert row.growing_share is None or 0.0 <= row.growing_share <= 1.0


class TestDupQualityInteraction:
    def test_partition_and_rates(self, spark):
        from pgsf_spark.analytics import dedup
        from pgsf_spark.tables import load_table

        rows = dedup.q_dup_quality_interaction(spark, SF).collect()
        assert 1 <= len(rows) <= 2
        total = sum(r.n_docs for r in rows)
        assert total == load_table(spark, SF, "documents").count()
        for r in rows:
            assert 0.0 <= r.filter_pass_rate <= 1.0
            assert r.mean_chars > 0


class TestTokenLengthHistogram:
    def test_shares_and_cap(self, spark):
        rows = corpus.q_token_length_histogram(spark, SF).collect()
        assert rows
        assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
        assert max(r.length for r in rows) <= corpus.TOKLEN_CAP + 1


class TestGramCoverage:
    def test_monotone_in_threshold(self, spark):
        rows = corpus.q_gram_frequency_coverage(spark, SF).collect()
        assert [r.threshold for r in rows] == corpus.GRAM_COV_THRESHOLDS
        covs = [r.occurrence_coverage for r in rows]
        rets = [r.type_retention for r in rows]
        # raising the floor can only shrink coverage and retention
        assert covs == sorted(covs, reverse=True)
        assert rets == sorted(rets, reverse=True)
        for r in rows:
            assert 0.0 <= r.type_retention <= r.occurrence_coverage <= 1.0


class TestAboveMeanConcentration:
    def test_pareto_direction(self, spark):
        from pgsf_spark.analytics import relational

        row = relational.q_above_mean_concentration(spark, SF).collect()[0]
        # above-mean customers hold MORE revenue share than head share
        assert row.revenue_share >= row.customer_share
        assert 0 < row.n_above_mean < row.n_customers


class TestLanguageMix:
    def test_dominant_share_bounds(self, spark):
        rows = corpus.q_language_mix_by_source(spark, SF).collect()
        assert len(rows) == 20
        for r in rows:
            # dominant at least 1/n_langs of docs, at most all
            assert 1.0 / r.n_langs - 1e-9 <= r.dominant_share <= 1.0
            assert r.dominant_lang


class TestLabelBalance:
    def test_entropy_and_shares(self, spark):
        rows = similarity.q_label_balance_audit(spark, SF).collect()
        assert rows
        assert abs(sum(r.share for r in rows) - 1.0) < 1e-4
        ne = rows[0].normalized_entropy
        assert 0.0 <= ne <= 1.0 + 1e-9
        assert rows[0].max_min_ratio >= 1.0

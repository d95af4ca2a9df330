"""Plan-regression suite: the physical plans of the gate queries must keep
the properties PERF.md documents -- no cartesian products anywhere, joins on
small dims broadcast, filters/projections pushed to the scans.

These tests only PLAN (executedPlan on sf0.001), so the whole sweep is
cheap; a future change that silently degrades a plan fails here, not in the
benchmark."""

import pytest

from pgsf_spark.analytics.registry import QUERIES
from pgsf_spark.planlint import partitionless_windows

SF = "/root/testdata/sf0.001"

# cosine_topk intentionally crossJoins a broadcast 1-row query vector --
# that's a BroadcastNestedLoopJoin, not a data-sized cartesian product.
CARTESIAN_OK = {"cosine_topk", "ann_lsh_topk"}

# Streaming faces (registered in round 11) execute a bounded availableNow
# stream inside fn() and return a localCheckpoint of the sink table -- the
# returned plan is a checkpoint scan with nothing for these lints to
# inspect, and building it costs a full stream run (~8-17 s each). The
# checkpoint shape is asserted once in
# tests/test_r11_staged.py::test_stream_faces_return_checkpoints; the
# faces' internal plans are pinned by tests/test_streaming.py.
STREAMING_FACES = frozenset(n for n in QUERIES if n.startswith("stream_"))
assert len(STREAMING_FACES) == 8, STREAMING_FACES
_LINTABLE = sorted(set(QUERIES) - STREAMING_FACES)


_PLAN_CACHE: dict[str, str] = {}


def plan_of(spark, name):
    # one plan build per query per session: four parametrized lint classes
    # read every registry plan, and planning is the whole cost of this file
    if name not in _PLAN_CACHE:
        df = QUERIES[name].fn(spark, SF)
        _PLAN_CACHE[name] = df._jdf.queryExecution().executedPlan().toString()
    return _PLAN_CACHE[name]


class TestNoCartesian:
    @pytest.mark.parametrize("name", sorted(n for n in _LINTABLE if n not in CARTESIAN_OK))
    def test_no_cartesian_product(self, spark, name):
        assert "CartesianProduct" not in plan_of(spark, name)


# Duplicate-pipeline lint (round 9): lsh_candidate_pairs derived its
# recovery chain from the bucket aggregate in a second union branch, and
# without exchange reuse the whole scan->minhash->band->groupBy pipeline ran
# TWICE -- a full duplicate corpus pass hidden in a one-line union. The
# plan-level signature of the class: the same source table scanned more
# times than the query's semantics need. An ABSOLUTE threshold is the wrong
# lint: the round-9 audit of all 382 plans found three DELIBERATE multi-scan
# patterns --
#   (a) unrolled bounded iterations (quality_classifier_gate's CLF_STEPS
#       gradient rounds, semantic_dedup / kmeans recompute passes) where
#       each pass re-reads the pruned feature columns by design,
#   (b) scalar-broadcast re-reads (a 1-row aggregate of the table crossJoined
#       back: mean-then-variance two-pass shapes like huber_mean),
#   (c) skew_hedged_join's hot/cold union, which scans its build side twice
#       ON PURPOSE, and per-check audit reports unioning independent checks
#       of the same table (referential_integrity_audit).
# So the lint is a DRIFT PIN, doc-counts style: every query whose plan
# reads one table more than twice is recorded below with its audited
# max-scans-per-table (default budget 2 = plain self-join); a new query or
# an edit that pushes a plan past its budget fails here and must either
# restructure (the r9 fixes: lsh_candidate_pairs chain emission,
# embedding_dim_correlation_topk / semantic_dedup / kmv_set_algebra
# bounded-aggregate checkpoints) or raise its pin WITH a reason from the
# three patterns above. The four largest pins found by the first audit
# (mrr_gate 12, burrows_delta 12, silhouette_panel 10,
# source_js_divergence 9) all turned out to be the bounded-checkpoint
# class and were FIXED, not pinned -- when raising a pin, check that
# first.
#
# Every pin carries an inline reason comment naming its pattern --
# a = unrolled bounded rounds, b = scalar-broadcast re-read (a bounded
# aggregate crossJoined/joined back), c = deliberate independent legs
# (hedged/per-check unions, exact-vs-approx gates, multi-leg survival /
# funnel compositions) -- ENFORCED by test_every_pin_carries_a_reason
# below (VERDICT r9 ask #7): an uncommented pin fails the suite.
SCAN_BUDGET = {
    "acf_daily_revenue": 4,  # a+b: unrolled lag rounds + series-mean re-read
    "adamic_adar_links": 4,  # c: pair self-join + degree leg over one graph scan
    "ann_ndcg_gate": 4,  # c: exact-truth leg + multiprobe leg each scan embeddings
    "ann_recall_at_5": 4,  # c: exact-truth + approx legs over embeddings
    "basket_lift": 5,  # b+c: basket pair self-join + support scalars re-read
    "bigram_lift": 5,  # b+c: bigram self-join + unigram totals re-read
    "bloom_membership": 4,  # a+b: unrolled hash rounds + filter-size scalar re-read
    "bm25_topk": 3,  # b: corpus df/avgdl scalars re-read under the doc scan
    "brand_share_shift": 4,  # b: per-window shares vs overall totals re-read
    "brier_decomposition": 4,  # b: bin stats + base-rate scalar re-read
    "calinski_harabasz_index": 3,  # b: global-centroid scalar re-read
    "cascade_erasure_audit": 4,  # c: per-stage audit legs unioned
    "chi2_residuals_topk": 4,  # b: expected-count margins re-read under cell leg
    "chi_square_independence": 4,  # b: row/col margins re-read under cell leg
    "cohens_kappa": 4,  # b: marginal-agreement scalars re-read
    "cohort_ltv": 3,  # c: first-activity-week leg joined back to revenue leg
    "conversion_hazard": 3,  # c: entry / convert / risk-set legs over events
    "corpus_novelty_curve": 6,  # b: per-chunk vocab vs cumulative-vocab re-reads
    "daily_growth_profile": 3,  # b: series-level growth scalars re-read
    "dau_wau_stickiness": 3,  # c: daily-actives leg self-joined for trailing-7 window
    "dedup_pipeline_summary": 3,  # c: per-stage summary legs over documents
    "dedup_source_shift": 6,  # c: inherits dedup_clusters legs + before/after source split
    "difference_in_differences": 4,  # b: per-cell means re-read for the DiD contrast
    "doc_perplexity": 4,  # b: corpus LM scalars re-read under the doc leg
    "dsir_weights": 5,  # b: source/target n-gram stats re-read
    "embedding_effective_rank": 4,  # b: covariance + trace scalar re-reads
    "event_funnel": 6,  # c: per-stage funnel legs unioned
    "fleiss_kappa": 4,  # b: category-share scalars re-read
    "g_test_independence": 4,  # b: margins re-read under cell leg
    "geo_nearest_neighbor": 7,  # c: probe panel + 3x3 neighbor-cell expansion legs
    "good_turing_unseen": 3,  # b: frequency-of-frequency scalars re-read
    "hampel_outlier_days": 6,  # c: +-3-day neighbor self-joins for window median/MAD
    "hll_merge_by_day": 4,  # c: register leg + cumulative-merge leg + exact check
    "huber_mean": 7,  # a: unrolled IRLS reweighting rounds
    "hybrid_rrf_topk": 3,  # c: BM25 + cosine retrieval legs fused by RRF
    "incremental_dedup": 5,  # c: batch-vs-historical legs + verify re-read
    "incremental_lsh_dedup": 7,  # c: batch/historical LSH legs + Jaccard verify
    "ivf_topk": 4,  # b: centroid train/assign legs re-read embeddings
    "ivfpq_recall_at_5": 4,  # a+c: bounded codebook rounds + exact-truth leg
    "jaccard_pairs": 4,  # c: candidate leg + exact-verify leg
    "james_stein_nation_means": 4,  # b: grand-mean shrinkage scalar re-read
    "kaplan_meier": 3,  # c: entry / convert / risk-set legs over events
    "kendall_tau_daily": 5,  # b+c: day-pair self-join + tie-count scalars
    "kneser_ney_continuation": 4,  # b: continuation-count scalars re-read
    "label_balance_audit": 4,  # b: per-label shares vs totals re-read
    "ljung_box_stat": 4,  # a+b: unrolled lag rounds + series-mean re-read
    "log_rank_test": 3,  # c: per-arm KM legs over events
    "lsh_containment": 3,  # c: candidate leg + containment-verify leg
    "mann_kendall_trend": 4,  # c: day-pair self-join legs
    "market_basket_rules": 7,  # b+c: pair/triple self-joins + support scalars
    "markov_next_event_accuracy": 4,  # b: transition-matrix + holdout legs
    "merge_upsert_customer": 7,  # c: anti-join + action-routing + union merge legs
    "minhash_jaccard_estimate": 4,  # a+c: bounded band rounds + exact-Jaccard leg
    "nelson_aalen_hazard": 3,  # c: entry / convert / risk-set legs over events
    "obrien_fleming_looks": 4,  # b: per-look cumulative stats re-read
    "pettitt_changepoint": 3,  # b+c: day-pair self-join + n scalar re-read
    "pmi_collocations": 5,  # b: unigram totals re-read under the bigram leg
    "quality_classifier_gate": 15,  # a: CLF_STEPS unrolled gradient rounds (audited r9)
    "query_likelihood_topk": 4,  # b: corpus LM scalars re-read under the doc leg
    "randomization_test_chars": 3,  # b: observed statistic re-read under permutation leg
    "referential_integrity_audit": 6,  # c: independent per-FK check legs unioned
    "retention_halflife": 3,  # b: cohort-base scalar re-read
    "revenue_anomaly_days": 3,  # a+b: trailing-window legs + series scalars
    "runs_test_daily": 3,  # b: series-median scalar re-read
    "segment_overlap_matrix": 4,  # c: segment x segment self-join over one scan
    "shapley_attribution": 4,  # b: per-coalition value scalars re-read
    "snapshot_diff_gate": 3,  # c: old/new snapshot legs + diff union
    "soft_delete_split": 3,  # c: per-merge-action routing legs
    "source_signature_terms": 4,  # b: corpus df totals re-read under source leg
    "sq_mse_by_bits": 6,  # c: per-bit-width quantization legs unioned
    "sq_recall_at_5": 6,  # c: exact-truth + per-bit quantized legs
    "t_closeness_audit": 4,  # b: global distribution re-read per cohort
    "time_to_convert": 3,  # c: first-view + first-purchase legs joined
    "transition_entropy": 5,  # b: transition totals re-read under pair leg
    "transition_lift_topk": 4,  # b: margin totals re-read under pair leg
    "value_outliers": 4,  # b: median then MAD then fence re-reads
    "wau_hll_gate": 4,  # c: register leg + window merge + exact WAU check
}
assert set(SCAN_BUDGET) <= set(QUERIES), set(SCAN_BUDGET) - set(QUERIES)


class TestNoDuplicatePipelines:
    @staticmethod
    def _scan_counts(plan):
        # attribute each FileScan to its table via the Location path (the
        # scan node itself prints `FileScan parquet [cols]` with no path,
        # so a node-line regex matches NOTHING -- the canary below guards
        # exactly this blindness)
        import re
        from collections import Counter

        return Counter(re.findall(r"(\w+)\.parquet", plan))

    @pytest.mark.parametrize("name", _LINTABLE)
    def test_scan_count_within_budget(self, spark, name):
        counts = self._scan_counts(plan_of(spark, name))
        budget = SCAN_BUDGET.get(name, 2)
        excess = {t: n for t, n in counts.items() if n > budget}
        assert not excess, (
            f"{name} scans {excess} more than its audited budget "
            f"({budget}) -- a duplicated pipeline crept in (the r9 LSH "
            f"class: checkpoint the shared subtree or emit all outputs "
            f"from one consumer tree), or raise the pin with a reason "
            f"from the three audited patterns"
        )

    def test_detector_sees_scans(self, spark):
        # canary: the regex must actually count parquet scans, so a Spark
        # plan-format change can't silently blind the lint
        counts = self._scan_counts(plan_of(spark, "revenue_by_nation"))
        assert sum(counts.values()) >= 2  # star join reads >= 2 tables

    def test_every_pin_carries_a_reason(self):
        # VERDICT r9 ask #7: a pin above the default 2 is a claim that the
        # extra scans are one of the three audited patterns -- the claim
        # must be WRITTEN next to the number, or a future raise degrades
        # into an unexplained magic constant. Parse this file's own source:
        # every entry line inside the SCAN_BUDGET literal needs an inline
        # `# <pattern>: <reason>` comment.
        import re

        src = open(__file__, encoding="utf-8").read()
        block = re.search(r"SCAN_BUDGET = \{\n(.*?)\n\}", src, re.S).group(1)
        bare = [
            line.strip()
            for line in block.splitlines()
            if re.match(r'\s*"\w+": \d+,', line)
            and not re.search(r"#\s*(?:[abc](?:\+[abc])?):\s*\S", line)
        ]
        assert bare == [], (
            f"SCAN_BUDGET pins without an inline pattern-reason comment "
            f"(format: '# a|b|c[+x]: why'): {bare}"
        )
        # and the parse itself must see every pin (canary against a format
        # drift that would make the lint vacuously pass)
        assert len(re.findall(r'"\w+": \d+,', block)) == len(SCAN_BUDGET)


# the pandas variants are the only sanctioned Python (Arrow-batched)
PYTHON_OK = {"token_stats_pandas"}


class TestNoPythonInHotPath:
    @pytest.mark.parametrize("name", sorted(n for n in _LINTABLE if n not in PYTHON_OK))
    def test_no_python_eval(self, spark, name):
        # row-at-a-time Python UDFs (BatchEvalPython) must never appear;
        # whole-stage JVM execution is the contract (SURVEY §2.9)
        assert "BatchEvalPython" not in plan_of(spark, name)


# Bounded-spine whitelist for the partition-less-window lint (VERDICT r7
# item 3). A Window with an EMPTY partition spec funnels its whole input
# through ONE task, so it is banned unless the windowed relation is bounded
# by something other than data volume. Every entry names its bound:
#
# day-grain calendar spine (orders span ~2.4k days; grows with TIME, never
# with corpus size -- 100 TB of orders still has the same day count):
_DAY_SPINE = {
    "acf_daily_revenue",
    "binary_segmentation_split",
    "conformal_interval_gate",
    "conversion_hazard",
    "cusum_changepoints",
    "daily_growth_profile",
    "durbin_watson",
    "ewma_control_chart",
    "kaplan_meier",
    "ljung_box_stat",
    "log_rank_test",
    "mase_seasonal_naive",
    "nelson_aalen_hazard",
    "pettitt_changepoint",
    "revenue_anomaly_days",
    "revenue_var_es",
    "rolling_median_revenue",
    "runs_test_daily",
    "spearman_trend",
    "sprt_decision",
    "stl_decomposition",
    "hourly_gap_interpolation",  # hour grain: calendar-bounded like days
}
# literal/tiny domain spines (compile-time constant row counts):
_LITERAL_SPINE = {
    "benford_audit",  # 9 leading-digit rows
    "benjamini_hochberg",  # 25 nation p-values
    "event_type_share",  # 5 event types
    "feature_psi",  # fixed-width score bins (literal bin count)
    "jaccard_threshold_histogram",  # 10 literal similarity buckets
    "decile_lift_table",  # 10 deciles (ntile itself is global_ntile now)
    "bootstrap_ci",  # BOOT_B literal bootstrap replicas
    "ivfpq_recall_at_5",  # IVFPQ_C=8 literal coarse centroids
}
# post-LIMIT pools: the window's input is the output of TakeOrdered(K), so
# it holds <= K literal rows no matter the corpus:
_POST_LIMIT = {
    "zipf_fit",  # rank over limit(ZIPF_TOP)
    "weighted_sample_topk",  # rank over limit(WSAMPLE_K)
    "hybrid_rrf_topk",  # per-leg rank over limit(LEG_TOPN)
    "ann_ndcg_gate",  # ranks over the two top-k candidate lists
}
GLOBAL_WINDOW_OK = _DAY_SPINE | _LITERAL_SPINE | _POST_LIMIT
# every whitelist entry must name a LIVE query: a renamed/removed query
# would otherwise leave a stale exemption behind (and the renamed query
# would silently lose its earned one) -- module-level so a violation fails
# collection, not one test among 1100
assert GLOBAL_WINDOW_OK <= set(QUERIES), GLOBAL_WINDOW_OK - set(QUERIES)


class TestNoGlobalWindow:
    @pytest.mark.parametrize(
        "name", sorted(n for n in _LINTABLE if n not in GLOBAL_WINDOW_OK)
    )
    def test_no_partitionless_window(self, spark, name):
        # data-grain global sorts must go through operators/ranking.py
        # (range partition + per-partition offsets), never one WindowExec
        hits = partitionless_windows(plan_of(spark, name))
        assert not hits, f"partition-less window(s) in {name}: {hits}"

    def test_detector_catches_global_window(self, spark):
        # the lint must actually fire on the shape it bans
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        df = (
            spark.range(100)
            .withColumn("rn", F.row_number().over(Window.orderBy("id")))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert partitionless_windows(plan)

    def test_detector_accepts_partitioned_window(self, spark):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        df = spark.range(100).withColumn("g", F.col("id") % 7)
        # partitionBy WITH order, and partitionBy WITHOUT order (the shape
        # the naive bracket-count heuristic misread as global)
        w1 = df.withColumn("rn", F.row_number().over(Window.partitionBy("g").orderBy("id")))
        w2 = df.withColumn("mx", F.max("id").over(Window.partitionBy("g")))
        for d in (w1, w2):
            plan = d._jdf.queryExecution().executedPlan().toString()
            assert not partitionless_windows(plan)


class TestKeyPlans:
    def test_star_joins_broadcast(self, spark):
        plan = plan_of(spark, "revenue_by_nation")
        assert plan.count("BroadcastHashJoin") >= 1
        assert "SortMergeJoin" not in plan or plan.count("Exchange hashpartitioning") <= 3

    def test_q6_scan_only(self, spark):
        plan = plan_of(spark, "forecast_revenue")
        assert "Exchange hashpartitioning" not in plan  # partial agg only
        assert "PushedFilters" in plan

    def test_pricing_summary_pushdown(self, spark):
        plan = plan_of(spark, "pricing_summary")
        assert "LessThanOrEqual(l_shipdate" in plan  # predicate at the scan
        assert "l_orderkey" not in plan.split("ReadSchema")[1][:200]  # pruned

    def test_merge_anti_join_broadcast(self, spark):
        plan = plan_of(spark, "merge_upsert_customer")
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    def test_edit_distance_blocked_equi_join(self, spark):
        # VERDICT r2: the string-similarity template must not be an all-pairs
        # nested loop -- deletion-neighborhood blocking makes it an equi-join
        plan = plan_of(spark, "name_min_edit_distance")
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

    def test_kmeans_broadcasts_centroids(self, spark):
        # each Lloyd round must crossJoin a BROADCAST centroid table (k rows)
        # -- the vectors themselves never shuffle for assignment
        plan = plan_of(spark, "kmeans_clusters")
        assert "BroadcastNestedLoopJoin" in plan
        assert "CartesianProduct" not in plan

    def test_q18_preaggregates_before_join(self, spark):
        # the HAVING pre-agg must reduce lineitem BEFORE any join: the
        # aggregate on l_orderkey appears below the first join in the plan
        plan = plan_of(spark, "large_volume_customers")
        first_join = min(
            i for i in (plan.find("BroadcastHashJoin"), plan.find("SortMergeJoin")) if i >= 0
        )
        agg_pos = plan.find("hashpartitioning(l_orderkey")
        # executedPlan prints root-first, so the pre-agg exchange appearing
        # AFTER the topmost join in the text means it sits BELOW the join in
        # the tree (runs first) -- lineitem reduces before anything joins
        assert agg_pos >= 0 and agg_pos > first_join

    def test_prefix_filter_token_equi_join(self, spark):
        # candidate generation must be a token equi-join, never all-pairs
        plan = plan_of(spark, "prefix_filter_pairs")
        assert "CartesianProduct" not in plan
        assert "hashpartitioning(token" in plan or "BroadcastHashJoin" in plan

    def test_q6_promo_broadcast(self, spark):
        # Q14: part is a broadcast dim; lineitem must not shuffle for the join
        plan = plan_of(spark, "promo_revenue")
        assert "BroadcastHashJoin" in plan
        assert "hashpartitioning(l_orderkey" not in plan


class TestRound3NewPlans:
    def test_q21_single_fact_aggregate(self, spark):
        # the EXISTS/NOT-EXISTS quantifiers must be ONE aggregate on the
        # join key -- no lineitem self-join anywhere in the plan
        plan = plan_of(spark, "waiting_suppliers")
        assert plan.count("hashpartitioning(l_orderkey") <= 2
        assert "CartesianProduct" not in plan

    def test_q2_broadcast_dims(self, spark):
        # part/supplier/nation/region side must broadcast into lineitem
        plan = plan_of(spark, "min_cost_supplier")
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan

    def test_q11_no_second_fact_scan(self, spark):
        # the grand-total scalar must reuse the per-part aggregate: exactly
        # one scan of lineitem in the whole plan
        plan = plan_of(spark, "important_parts")
        assert plan.count("lineitem.parquet") <= 1 or plan.count("Scan parquet") <= 2

    def test_vocab_membership_broadcast(self, spark):
        # the top-K vocab joins back as a broadcast -- the exploded corpus
        # side must not shuffle for the membership test
        plan = plan_of(spark, "vocab_coverage")
        assert "BroadcastHashJoin" in plan
        # the only token shuffle is the vocab-frequency aggregate; the
        # membership join over the exploded corpus must not add another
        assert plan.count("Exchange hashpartitioning(token") <= 1

    def test_incremental_dedup_fp_joins(self, spark):
        # history membership + in-batch first-wins are both fp equi-joins
        plan = plan_of(spark, "incremental_dedup")
        assert "LeftAnti" in plan
        assert "CartesianProduct" not in plan

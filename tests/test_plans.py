"""Plan-regression suite: the physical plans of the gate queries must keep
the properties PERF.md documents -- no cartesian products anywhere, joins on
small dims broadcast, filters/projections pushed to the scans.

These tests only PLAN (executedPlan on sf0.001), so the whole sweep is
cheap; a future change that silently degrades a plan fails here, not in the
benchmark."""

import pytest

from pgsf_spark.analytics.registry import QUERIES

SF = "/root/testdata/sf0.001"

# cosine_topk intentionally crossJoins a broadcast 1-row query vector --
# that's a BroadcastNestedLoopJoin, not a data-sized cartesian product.
CARTESIAN_OK = {"cosine_topk", "ann_lsh_topk"}


def plan_of(spark, name):
    df = QUERIES[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


class TestNoCartesian:
    @pytest.mark.parametrize("name", sorted(n for n in QUERIES if n not in CARTESIAN_OK))
    def test_no_cartesian_product(self, spark, name):
        assert "CartesianProduct" not in plan_of(spark, name)


# the pandas variants are the only sanctioned Python (Arrow-batched)
PYTHON_OK = {"token_stats_pandas"}


class TestNoPythonInHotPath:
    @pytest.mark.parametrize("name", sorted(n for n in QUERIES if n not in PYTHON_OK))
    def test_no_python_eval(self, spark, name):
        # row-at-a-time Python UDFs (BatchEvalPython) must never appear;
        # whole-stage JVM execution is the contract (SURVEY §2.9)
        assert "BatchEvalPython" not in plan_of(spark, name)


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

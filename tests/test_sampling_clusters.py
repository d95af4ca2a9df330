"""Deterministic sampling/split operators + connected-components dedup
clustering (training-data pipeline, round 2)."""

from pyspark.sql import functions as F

from pgsf_spark.analytics.dedup import connected_components
from pgsf_spark.analytics.sampling import assign_split, sample_per_group


class TestConnectedComponents:
    def test_known_graph(self, spark):
        # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
            "doc_a long, doc_b long",
        )
        got = {r["doc_id"]: r["cluster"] for r in connected_components(edges).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    def test_long_chain_converges(self, spark):
        # a 30-node path needs multiple propagation rounds
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(30)], "doc_a long, doc_b long"
        )
        got = connected_components(edges)
        assert {r["cluster"] for r in got.collect()} == {0}
        assert got.count() == 31

    def test_path_graph_logarithmic_rounds(self, spark):
        # the 100 TB risk case: a chain-shaped near-dup graph (serially
        # correlated crawls). Diameter 9,999 -- min-label propagation would
        # need ~10k rounds; large-star/small-star must converge in O(log n).
        import math

        n = 10_000
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
        )
        stats = {}
        got = connected_components(edges, stats=stats)
        assert stats["rounds"] <= math.ceil(math.log2(n)) + 4
        assert {r["cluster"] for r in got.collect()} == {0}
        assert got.count() == n

    def test_direction_irrelevant(self, spark):
        a = spark.createDataFrame([(5, 9)], "doc_a long, doc_b long")
        b = spark.createDataFrame([(9, 5)], "doc_a long, doc_b long")
        ra = sorted(map(tuple, connected_components(a).collect()))
        rb = sorted(map(tuple, connected_components(b).collect()))
        assert ra == rb == [(5, 5), (9, 5)]


class TestAssignSplit:
    def test_deterministic_and_total(self, spark):
        df = spark.range(0, 10_000).withColumnRenamed("id", "k")
        s1 = assign_split(df, "k")
        s2 = assign_split(df, "k")
        assert s1.filter(F.col("split").isNull()).count() == 0
        # same assignment on recompute (no rand())
        joined = s1.alias("a").join(s2.alias("b"), "k")
        assert joined.filter(F.col("a.split") != F.col("b.split")).count() == 0

    def test_proportions_near_80_10_10(self, spark):
        df = spark.range(0, 10_000).withColumnRenamed("id", "k")
        counts = dict(
            (r["split"], r["count"]) for r in assign_split(df, "k").groupBy("split").count().collect()
        )
        assert abs(counts["train"] - 8000) < 300
        assert abs(counts["val"] - 1000) < 150
        assert abs(counts["test"] - 1000) < 150

    def test_no_shuffle_in_plan(self, spark):
        df = spark.range(0, 100, numPartitions=4).withColumnRenamed("id", "k")
        plan = assign_split(df, "k")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure projection


class TestSamplePerGroup:
    def test_exactly_n_per_group(self, spark):
        df = spark.range(0, 1000).select(
            (F.col("id") % 7).alias("g"), F.col("id").alias("k")
        )
        out = sample_per_group(df, "g", "k", 5)
        sizes = [r["count"] for r in out.groupBy("g").count().collect()]
        assert sizes == [5] * 7

    def test_deterministic(self, spark):
        df = spark.range(0, 500).select((F.col("id") % 3).alias("g"), F.col("id").alias("k"))
        a = sorted(map(tuple, sample_per_group(df, "g", "k", 4).collect()))
        b = sorted(map(tuple, sample_per_group(df, "g", "k", 4).collect()))
        assert a == b

    def test_small_group_returns_all(self, spark):
        df = spark.createDataFrame([(1, 100), (1, 101)], "g int, k long")
        assert sample_per_group(df, "g", "k", 10).count() == 2


class TestConnectedComponentsProperty:
    """Randomized equivalence vs a reference union-find: the min-label
    fixpoint must produce exactly the partition a sequential union-find
    does, for any edge list."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    edges_st = st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )

    @settings(max_examples=8, deadline=None)
    @given(pairs=edges_st)
    def test_matches_union_find(self, spark, pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {}
        for n in parent:
            root = find(n)
            expected.setdefault(root, set()).add(n)
        # min-label form: every node labeled with its component minimum
        want = {n: min(c) for c in expected.values() for n in c}

        edges = spark.createDataFrame(
            [(int(a), int(b)) for a, b in pairs], "doc_a long, doc_b long"
        )
        got = {r["doc_id"]: r["cluster"] for r in connected_components(edges).collect()}
        assert got == want


class TestKcorePeel:
    def test_known_graph_peels_to_triangle(self, spark):
        # triangle {1,2,3} + pendant chain 3-4-5: the chain peels away in
        # two rounds, leaving exactly the 2-core triangle
        from pgsf_spark.analytics import dedup

        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)], "doc_a long, doc_b long"
        )
        e = edges
        for _ in range(dedup.KCORE_ROUNDS):
            sym = e.union(e.selectExpr("doc_b as doc_a", "doc_a as doc_b"))
            from pyspark.sql import functions as F

            keep = (
                sym.groupBy("doc_a").count().filter(F.col("count") >= dedup.KCORE_K).select("doc_a")
            )
            e = (
                e.join(keep, "doc_a")
                .join(keep.withColumnRenamed("doc_a", "doc_b"), "doc_b")
                .select("doc_a", "doc_b")
            )
        got = sorted(map(tuple, e.collect()))
        assert got == [(1, 2), (1, 3), (2, 3)]

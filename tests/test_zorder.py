"""Z-order clustering (operators/clustering.py) + file-skipping synergy."""

import pytest
from pyspark.sql import functions as F

from pgsf_spark.operators.clustering import interleave_bits, scale_to_int, zorder
from pgsf_spark.operators.table_store import TableStore


class TestInterleave:
    def test_known_morton_values(self, spark):
        df = spark.createDataFrame([(3, 0), (0, 3), (3, 3)], "x long, y long")
        got = [
            r["z"]
            for r in df.select(
                interleave_bits([F.col("x"), F.col("y")], bits=2).alias("z")
            ).collect()
        ]
        # x bits land at even positions, y bits at odd: (3,0)->0b0101, (0,3)->0b1010
        assert got == [0b0101, 0b1010, 0b1111]

    def test_overflow_guard(self):
        with pytest.raises(AssertionError):
            interleave_bits([F.lit(0)] * 6, bits=12)

    def test_scale_nulls_and_degenerate(self, spark):
        df = spark.createDataFrame([(None,), (5,)], "v int")
        got = [
            r["s"]
            for r in df.select(
                scale_to_int(F.col("v"), F.lit(5), F.lit(5), bits=4).alias("s")
            ).collect()
        ]
        assert got == [0, 0]


class TestZorderSkipping:
    def test_both_dimensions_prune(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "store"))
        n = 64
        grid = spark.range(n * n).select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
        store.write(zorder(grid, ["x", "y"], num_files=16), "zt")
        total = len(store.read("zt").inputFiles())
        assert total >= 8  # layout actually split into many files

        px = store.read_pruned("zt", "x", lo=0, hi=7)
        py = store.read_pruned("zt", "y", lo=0, hi=7)
        assert px.count() == 8 * n and py.count() == 8 * n
        # the Z-curve gives BOTH dimensions locality: a 1/8th slice of either
        # axis must skip most files (linear sort would prune only one axis)
        assert len(px.inputFiles()) < total / 2
        assert len(py.inputFiles()) < total / 2

    def test_zorder_preserves_rows(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "store"))
        df = spark.range(1000).select(
            F.col("id"), F.hash("id").alias("a"), (F.col("id") * 3).alias("b")
        )
        store.write(zorder(df, ["a", "b"], num_files=8), "t")
        assert store.read("t").count() == 1000
        assert sorted(r["id"] for r in store.read("t").select("id").collect()) == list(range(1000))


class TestCompactZorder:
    def test_compact_with_zorder_clusters_and_prunes(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "store"))
        n = 32
        grid = spark.range(n * n).select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
        ).repartition(8)
        store.write(grid, "t")
        store.compact("t", target_partitions=8, zorder_by=["x", "y"])
        assert store.manifest("t")["zorder_by"] == ["x", "y"]
        total = len(store.read("t").inputFiles())
        pруned = store.read_pruned("t", "y", lo=0, hi=3)
        assert pруned.count() == 4 * n
        assert len(pруned.inputFiles()) < total

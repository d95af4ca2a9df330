"""Delta-join IVM tests: additive maintenance of a star join-aggregate
view equals a from-scratch recompute after every append, refresh is
exactly-once (watermark lives in the published manifest), and re-delivery
is a no-op."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pgsf_spark.operators.incremental_join_agg import IncrementalJoinAggregate
from pgsf_spark.operators.table_store import TableStore

T = datetime

DIM_ROWS = [(1, 10), (2, 10), (3, 20), (4, 30)]  # custkey -> nationkey
FACT_SCHEMA = "o_orderkey long, o_custkey long, o_totalprice double, modstamp timestamp"

BATCH1 = [
    (100, 1, 10.0, T(2024, 1, 1, 0, 0)),
    (101, 2, 20.0, T(2024, 1, 1, 1, 0)),
    (102, 3, 30.0, T(2024, 1, 1, 2, 0)),
]
BATCH2 = [
    (103, 1, 5.5, T(2024, 1, 2, 0, 0)),
    (104, 4, 7.25, T(2024, 1, 2, 1, 0)),  # first order for nation 30
]
BATCH3 = [
    (105, 2, 1.0, T(2024, 1, 3, 0, 0)),
    (106, 2, 2.0, T(2024, 1, 3, 0, 0)),  # same-stamp pair lands atomically
]


@pytest.fixture()
def ivm_env(spark, tmp_path):
    fact_dir = str(tmp_path / "fact.parquet")

    def append(rows, mode):
        spark.createDataFrame(rows, FACT_SCHEMA).write.mode(mode).parquet(fact_dir)

    append(BATCH1, "overwrite")
    dim = spark.createDataFrame(DIM_ROWS, "o_custkey long, nationkey int")
    ivm = IncrementalJoinAggregate(
        spark,
        TableStore(spark, str(tmp_path / "store")),
        "rev_by_nation",
        fact_fn=lambda: spark.read.parquet(fact_dir),
        dim_fn=lambda: dim,
        on="o_custkey",
        ts_col="modstamp",
        group_cols=("nationkey",),
        # additive parts only: DECIMAL sum + count (avg derivable on read)
        aggs={"n": "count(1)", "revenue": "sum(CAST(o_totalprice AS DECIMAL(27,4)))"},
    )
    return ivm, append, spark


def view_dict(df):
    return {r["nationkey"]: (r["n"], float(r["revenue"])) for r in df.collect()}


def full_recompute(ivm):
    return view_dict(ivm._delta_view(ivm.fact_fn()))


class TestIncrementalJoinAggregate:
    def test_bootstrap_equals_full(self, ivm_env):
        ivm, _, _ = ivm_env
        ivm.bootstrap()
        assert view_dict(ivm.read()) == {10: (2, 30.0), 20: (1, 30.0)}
        assert view_dict(ivm.read()) == full_recompute(ivm)

    def test_refresh_matches_full_recompute_per_batch(self, ivm_env):
        ivm, append, _ = ivm_env
        ivm.bootstrap()
        for batch in (BATCH2, BATCH3):
            append(batch, "append")
            res = ivm.refresh()
            assert res["delta_groups"] > 0
            assert view_dict(ivm.read()) == full_recompute(ivm)
        # new group appeared via the delta path
        assert view_dict(ivm.read())[30] == (1, 7.25)

    def test_refresh_without_new_rows_is_noop(self, ivm_env):
        ivm, append, _ = ivm_env
        ivm.bootstrap()
        append(BATCH2, "append")
        ivm.refresh()
        before = view_dict(ivm.read())
        wm_before = ivm.watermark()
        res = ivm.refresh()  # re-delivery: nothing past the watermark
        assert res["delta_groups"] == 0
        assert view_dict(ivm.read()) == before
        assert ivm.watermark() == wm_before

    def test_watermark_travels_with_version(self, ivm_env):
        """Crash-safety invariant: data and watermark flip atomically, so
        the CURRENT version's manifest always names the watermark that
        produced its rows."""
        ivm, append, _ = ivm_env
        ivm.bootstrap()
        assert ivm.watermark() == T(2024, 1, 1, 2, 0)
        append(BATCH2, "append")
        ivm.refresh()
        assert ivm.watermark() == T(2024, 1, 2, 1, 0)
        # the previous version still carries ITS watermark (time travel)
        versions = ivm.store.versions("rev_by_nation")
        old = ivm.store.manifest("rev_by_nation", versions[0])
        assert old["ivm_watermark"].startswith("2024-01-01 02:00:00")

    def test_additive_merge_is_exact_decimal(self, ivm_env):
        """Fractional prices accumulate in DECIMAL: incremental total is
        bit-equal to the full recompute, not within-epsilon."""
        ivm, append, _ = ivm_env
        ivm.bootstrap()
        append(BATCH2, "append")
        ivm.refresh()
        append(BATCH3, "append")
        ivm.refresh()
        inc = {k: v[1] for k, v in view_dict(ivm.read()).items()}
        full = {k: v[1] for k, v in full_recompute(ivm).items()}
        assert inc == full  # exact equality, no tolerance


class TestStreamingDrivenIvm:
    def test_foreachbatch_stream_triggers_refresh(self, ivm_env, tmp_path):
        """Structured-Streaming integration: the change feed is a file
        stream and each micro-batch triggers one delta refresh -- the
        stream is the scheduler (C2), the manifest watermark stays the
        exactly-once guard (C3), and the final view equals a full
        recompute."""
        ivm, append, spark = ivm_env
        ivm.bootstrap()
        append(BATCH2, "append")
        append(BATCH3, "append")
        feed = (
            spark.readStream.schema(FACT_SCHEMA)
            .parquet(str(tmp_path / "fact.parquet"))
        )
        q = (
            feed.writeStream.foreachBatch(lambda b, eid: ivm.refresh())
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert view_dict(ivm.read()) == full_recompute(ivm)
        # nation 10 serves custkeys 1 and 2: orders 100, 101, 103, 105, 106
        assert view_dict(ivm.read())[10] == (5, 38.5)

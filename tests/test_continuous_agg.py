"""Continuous-aggregate (incremental rollup) tests: refresh touches only
new/late buckets and always matches a from-scratch recomputation."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pgsf_spark.operators.continuous_agg import ContinuousAggregate
from pgsf_spark.operators.table_store import TableStore
from pgsf_spark.sync.state import SyncState

T = datetime


@pytest.fixture()
def ca_env(spark, tmp_path):
    src_dir = str(tmp_path / "events.parquet")
    schema = "event_id long, ts timestamp, event_type string, value double"

    def write(rows, mode="overwrite"):
        spark.createDataFrame(rows, schema).write.mode(mode).parquet(src_dir)

    write(
        [
            (1, T(2024, 1, 1, 0, 10), "click", 1.0),
            (2, T(2024, 1, 1, 0, 40), "view", 2.0),
            (3, T(2024, 1, 1, 1, 10), "click", 3.0),
        ]
    )
    ca = ContinuousAggregate(
        spark,
        TableStore(spark, str(tmp_path / "store")),
        SyncState(str(tmp_path / "sync.json")),
        "hourly_rollup",
        source_fn=lambda: spark.read.parquet(src_dir),
        ts_col="ts",
        bucket="hour",
        group_cols=("event_type",),
        aggs={"n": "count(1)", "total": "CAST(sum(CAST(value AS DECIMAL(27,4))) AS DOUBLE)"},
    )
    return ca, write, spark


def rollup_dict(df):
    return {(str(r["bucket"]), r["event_type"]): (r["n"], r["total"]) for r in df.collect()}


class TestContinuousAggregate:
    def test_bootstrap(self, ca_env):
        ca, write, spark = ca_env
        n = ca.bootstrap(T(2024, 1, 1, 1, 10))
        assert n == 3  # (h0,click),(h0,view),(h1,click)

    def test_incremental_refresh_only_touched_buckets(self, ca_env):
        ca, write, spark = ca_env
        ca.bootstrap(T(2024, 1, 1, 1, 10))
        # new events: one in a NEW hour, one late-ish in hour 1
        write(
            [
                (1, T(2024, 1, 1, 0, 10), "click", 1.0),
                (2, T(2024, 1, 1, 0, 40), "view", 2.0),
                (3, T(2024, 1, 1, 1, 10), "click", 3.0),
                (4, T(2024, 1, 1, 1, 50), "click", 4.0),  # hour 1 again
                (5, T(2024, 1, 1, 2, 5), "view", 5.0),  # new hour 2
            ]
        )
        res = ca.refresh()
        assert res["touched_buckets"] == 2  # hours 1 and 2 only
        got = rollup_dict(ca.read())
        assert got[("2024-01-01 00:00:00", "click")] == (1, 1.0)  # untouched, carried over
        assert got[("2024-01-01 01:00:00", "click")] == (2, 7.0)  # recomputed
        assert got[("2024-01-01 02:00:00", "view")] == (1, 5.0)  # new bucket

    def test_refresh_matches_full_recompute(self, ca_env):
        ca, write, spark = ca_env
        ca.bootstrap(T(2024, 1, 1, 1, 10))
        write(
            [
                (1, T(2024, 1, 1, 0, 10), "click", 1.0),
                (2, T(2024, 1, 1, 0, 40), "view", 2.0),
                (3, T(2024, 1, 1, 1, 10), "click", 3.0),
                (6, T(2024, 1, 1, 3, 0), "error", 9.0),
            ]
        )
        ca.refresh()
        incremental = rollup_dict(ca.read())
        scratch = rollup_dict(ca._aggregate(ca.source_fn()))
        assert incremental == scratch

    def test_noop_refresh(self, ca_env):
        ca, write, spark = ca_env
        ca.bootstrap(T(2024, 1, 1, 1, 10))
        res = ca.refresh()  # nothing newer than the watermark
        assert res["touched_buckets"] == 0
        assert len(rollup_dict(ca.read())) == 3

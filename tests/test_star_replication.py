"""Integration: replicate the whole star schema through the Engine and run
analytics on the replicas (the reference's end state: ad-hoc SQL on local
copies -- §3.3)."""

import pytest

from pgsf_spark.engine import Engine
from pgsf_spark.fixtures import STAR_KEYS, as_entity
from pgsf_spark.tables import load_table

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def star_engine(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("star")
    src = tmp / "src"
    src.mkdir()
    for t, keys in STAR_KEYS.items():
        as_entity(load_table(spark, SF_DIR, t), keys).write.parquet(str(src / f"{t}.parquet"))
    eng = Engine(spark, str(src), str(tmp / "work"))
    for t in STAR_KEYS:
        eng.bulk_load(t)
    return eng


class TestStarReplication:
    def test_all_tables_replicated(self, star_engine):
        for t in STAR_KEYS:
            assert star_engine.store.exists(t)
        assert star_engine.table("lineitem").count() == 6000

    def test_composite_key_ids(self, star_engine):
        row = star_engine.table("lineitem").filter("l_orderkey = 0 AND l_linenumber = 3").first()
        assert row["Id"] == "0-3"

    def test_analytics_on_replicas(self, star_engine):
        # revenue by nation over the REPLICAS (not the source) -- the point
        # of replication
        df = star_engine.sql(
            """
            SELECT n_name, COUNT(*) AS n
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
            """
        )
        assert df.count() == 25

    def test_soql_over_replica(self, star_engine):
        assert star_engine.soql("SELECT COUNT() FROM orders") == 1500
        rows = star_engine.soql("SELECT Id, o_totalprice FROM orders WHERE o_totalprice > 400000").collect()
        assert all(r["o_totalprice"] > 400000 for r in rows)

    def test_all_states_ready(self, star_engine):
        for t in STAR_KEYS:
            assert star_engine.state.get(t).status == "ready"

    def test_concurrent_scheduler_tick_syncs_all(self, star_engine):
        # the cron tick fans out one sync per due table concurrently
        # (sync:14-20); all seven star tables sync in one tick
        for t in STAR_KEYS:
            star_engine.state.release(t, "ready", touch_refresh=False)
        results = star_engine.sync_due(max_workers=4)
        assert {r["table"] for r in results} == set(STAR_KEYS)
        for t in STAR_KEYS:
            assert star_engine.state.get(t).status == "ready"

"""CLI workflow test: drives python -m pgsf_spark main() end-to-end
(describe -> ddl -> bulk-load -> sync -> soql -> state)."""

from datetime import datetime

import pytest


@pytest.fixture()
def cli_env(spark, tmp_path, monkeypatch, capsys):
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [("c1", "alice", 10.0, datetime(2024, 1, 1), False)],
        "Id string, name string, bal double, SystemModstamp timestamp, IsDeleted boolean",
    ).write.parquet(str(src / "customer.parquet"))

    # reuse the test session instead of letting the CLI build local[32]
    import pgsf_spark.session as sess

    monkeypatch.setattr(sess, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    def run(*argv):
        from pgsf_spark.__main__ import main

        rc = main(["--source-dir", str(src), "--workdir", str(tmp_path / "work"), *argv])
        out = capsys.readouterr().out
        return rc, out

    return run


class TestCli:
    def test_full_workflow(self, cli_env):
        run = cli_env
        rc, out = run("describe", "customer")
        assert rc == 0 and out.startswith('"FieldName","Import","Indexed","Note"')
        rc, out = run("ddl", "customer")
        assert "CREATE TABLE" in out
        rc, out = run("bulk-load", "customer")
        assert '"rows": 1' in out
        rc, out = run("soql", "SELECT name FROM customer")
        assert '"name": "alice"' in out
        rc, out = run("state")
        assert '"status": "ready"' in out
        rc, out = run("abort", "customer")
        rc, out = run("recover")
        assert out.strip().endswith("[]}")  # error-status rows stay paused (only running recovers)
        rc, out = run("gc", "customer", "--keep", "1", "--ttl-days", "0")
        assert rc == 0
        import json as _json

        gc_out = _json.loads(out.strip().splitlines()[-1])
        assert gc_out["compacted"] is True
        # compact published a new version; keep=1 + ttl 0 leaves only it
        assert isinstance(gc_out["vacuumed"], list)


class TestVerifySubcommand:
    def test_verify_named_queries(self, capsys):
        import json

        from pgsf_spark.__main__ import main

        rc = main(["verify", "--sf-dir", "/root/testdata/sf0.001", "count_orders", "top_orders"])
        out = capsys.readouterr().out.strip().splitlines()
        assert rc == 0
        assert json.loads(out[-1]) == {"pass": 2, "fail": 0}


class TestCorpusBuildCli:
    def test_corpus_build_materializes_manifest(self, cli_env, tmp_path):
        import json

        run = cli_env
        rc, out = run("corpus-build", "--sf-dir", "/root/testdata/sf0.001")
        assert rc == 0
        res = json.loads(out.strip().splitlines()[-1])
        assert res["table"] == "training_manifest"
        assert res["rows"] > 0
        assert set(res["splits"]) == {"train", "val", "test"}
        assert sum(res["splits"].values()) == res["rows"]
        # split-partitioned layout on disk (partition pruning for readers)
        store_dir = tmp_path / "work" / "tables" / "training_manifest"
        if store_dir.exists():
            hive_dirs = list(store_dir.rglob("split=*"))
            assert hive_dirs, "expected hive split=... partition dirs"


class TestExplainCommand:
    def test_explain_emits_plan_audit(self, cli_env):
        import json

        run = cli_env  # reuses the test session and no-ops spark.stop
        rc, out = run("explain", "revenue_by_nation")
        assert rc == 0
        audit = json.loads(out.strip().splitlines()[-1])
        assert audit["query"] == "revenue_by_nation"
        assert audit["broadcast_hash_joins"] >= 1
        assert audit["cartesian_product"] is False
        assert audit["python_row_udfs"] is False

    def test_explain_unknown_query(self, cli_env):
        run = cli_env
        rc, _ = run("explain", "no_such_query")
        assert rc == 2


class TestDeleteCommand:
    def test_delete_after_bulk_load(self, cli_env):
        import json

        run = cli_env
        rc, _ = run("bulk-load", "customer")
        assert rc == 0
        rc, out = run("delete", "customer", "--pk", "Id", "--keys", "c1")
        assert rc == 0
        stats = json.loads(out.strip().splitlines()[-1])
        assert stats["n_deleted"] == 1
        rc, out = run("soql", "SELECT COUNT() FROM customer")
        assert rc == 0 and "0" in out


class TestOptimizeCommand:
    def test_optimize_compacts_analyzes_and_vacuums(self, cli_env):
        import json

        run = cli_env
        rc, _ = run("bulk-load", "customer")
        assert rc == 0
        rc, out = run("optimize", "customer", "--bloom", "Id")
        assert rc == 0
        stats = json.loads(out.strip().splitlines()[-1])
        assert stats["row_count"] == 1
        assert stats["bloom_indexed_files"]["Id"] >= 1
        rc, out = run("soql", "SELECT COUNT() FROM customer")
        assert rc == 0 and "1" in out


class TestSqlCommand:
    def test_sql_over_testdata_views(self, cli_env):
        import json

        rc, out = cli_env(
            "sql",
            "SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS c FROM orders",
            "--sf-dir",
            "/root/testdata/sf0.001",
        )
        assert rc == 0
        row = json.loads(out.strip())
        assert row["n"] > 0 and 0 < row["c"] <= row["n"]

    def test_sql_sees_store_tables(self, cli_env, tmp_path):
        import json

        # a table published into the workdir store is queryable by name
        cli_env("bulk-load", "customer")
        rc, out = cli_env(
            "sql",
            "SELECT name FROM customer WHERE Id = 'c1'",
            "--sf-dir",
            str(tmp_path / "nonexistent"),  # no test-data views: store only
        )
        assert rc == 0
        assert json.loads(out.strip())["name"] == "alice"

    def test_sql_limit(self, cli_env):
        rc, out = cli_env(
            "sql",
            "SELECT l_orderkey FROM lineitem",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--limit",
            "7",
        )
        assert rc == 0
        assert len(out.strip().splitlines()) == 7

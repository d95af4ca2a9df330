"""JDBC PostgreSQL sink (reference's real target, csv_to_postgres.py /
query_poll_table.py merge transaction).

Statement generation and the staged-merge orchestration are unit-tested with
an injected executor; the live tier runs only when PGSF_TEST_PG_DSN is set
(gated-live pattern, like the vendored client's endpoint tests)."""

import os
from datetime import datetime

import pytest

from pgsf_spark.operators.jdbc_sink import (
    JdbcPostgresSink,
    escape_ident,
    full_load_sql,
    merge_sql,
    staging_table_name,
)

T0 = datetime(2024, 1, 1)


class TestSqlGeneration:
    def test_escape_ident_quotes_and_doubles(self):
        assert escape_ident("simple") == '"simple"'
        assert escape_ident('we"ird') == '"we""ird"'

    def test_full_load_truncates(self):
        assert full_load_sql("customer") == ['TRUNCATE TABLE "customer"']

    def test_merge_sql_reference_shape(self):
        stmts = merge_sql("customer", ["Id", "name", "bal"], pk="Id")
        assert len(stmts) == 3
        upsert, delete, drop = stmts
        # INSERT ... SELECT from staging, non-deleted only, ON CONFLICT upsert
        assert upsert.startswith('INSERT INTO "customer" ("Id", "name", "bal") SELECT')
        assert 'FROM "tmp_customer" WHERE NOT COALESCE("IsDeleted", FALSE)' in upsert
        assert 'ON CONFLICT ("Id") DO UPDATE SET "name" = EXCLUDED."name", "bal" = EXCLUDED."bal"' in upsert
        # delete pass: EVERY key with a deleted row (delete beats same-batch update)
        assert delete == (
            'DELETE FROM "customer" WHERE "Id" IN '
            '(SELECT "Id" FROM "tmp_customer" WHERE COALESCE("IsDeleted", FALSE))'
        )
        assert drop == 'DROP TABLE "tmp_customer"'

    def test_merge_sql_without_soft_delete(self):
        stmts = merge_sql("t", ["Id", "v"], pk="Id", isdeleted_col=None)
        assert len(stmts) == 2  # upsert + drop, no delete pass
        assert "WHERE NOT" not in stmts[0]
        assert "IsDeleted" not in " ".join(stmts)

    def test_pk_not_in_update_set(self):
        upsert = merge_sql("t", ["Id", "v"], pk="Id")[0]
        assert '"Id" = EXCLUDED."Id"' not in upsert


class TestStagedMergeOrchestration:
    def test_staged_merge_dedups_stages_and_runs(self, spark, monkeypatch):
        executed: list[list[str]] = []
        staged = {}
        sink = JdbcPostgresSink("jdbc:postgresql://x/db", run_sql=executed.append)

        def fake_stage(changes, table):
            staged["table"] = staging_table_name(table)
            staged["rows"] = sorted(tuple(r) for r in changes.collect())
            staged["cols"] = changes.columns
            return staged["table"]

        monkeypatch.setattr(sink, "stage_changes", fake_stage)
        changes = spark.createDataFrame(
            [
                ("c1", "old", 1.0, T0, False, 0),
                ("c1", "new", 2.0, datetime(2024, 1, 2), False, 1),  # latest wins
                ("c2", "dead", 0.0, T0, True, 2),
            ],
            "Id string, name string, bal double, SystemModstamp timestamp, IsDeleted boolean, _file_order long",
        )
        stmts = sink.staged_merge(changes, "customer", pk="Id", ts_field="SystemModstamp")
        # staged exactly the latest-per-key rows, target cols + IsDeleted
        assert staged["table"] == "tmp_customer"
        assert staged["cols"] == ["Id", "name", "bal", "SystemModstamp", "IsDeleted"]
        names = {r[0]: r[1] for r in staged["rows"]}
        assert names == {"c1": "new", "c2": "dead"}
        # and ran the reference's transaction
        assert executed == [stmts]
        assert stmts[0].startswith('INSERT INTO "customer"')
        assert stmts[-1] == 'DROP TABLE "tmp_customer"'

    def test_default_properties(self):
        sink = JdbcPostgresSink("jdbc:postgresql://x/db")
        assert sink.properties["driver"] == "org.postgresql.Driver"
        assert sink.properties["batchsize"] == "10000"


@pytest.mark.skipif(
    not os.environ.get("PGSF_TEST_PG_DSN"),
    reason="live PostgreSQL tier: set PGSF_TEST_PG_DSN=jdbc:postgresql://... to run",
)
class TestLivePostgres:
    def test_full_load_and_staged_merge_roundtrip(self, spark):
        dsn = os.environ["PGSF_TEST_PG_DSN"]
        props = {}
        if os.environ.get("PGSF_TEST_PG_USER"):
            props["user"] = os.environ["PGSF_TEST_PG_USER"]
        if os.environ.get("PGSF_TEST_PG_PASSWORD"):
            props["password"] = os.environ["PGSF_TEST_PG_PASSWORD"]
        sink = JdbcPostgresSink(dsn, properties=props)
        base = spark.createDataFrame(
            [("c1", "alice", 10.0, T0), ("c2", "bob", 20.0, T0)],
            "Id string, name string, bal double, SystemModstamp timestamp",
        )
        sink.full_load(base, "pgsf_test_customer", truncate_first=False)
        changes = spark.createDataFrame(
            [("c2", "bob2", 25.0, datetime(2024, 1, 2), False, 0),
             ("c3", "carol", 30.0, datetime(2024, 1, 2), False, 1)],
            "Id string, name string, bal double, SystemModstamp timestamp, IsDeleted boolean, _file_order long",
        )
        sink.staged_merge(changes, "pgsf_test_customer", pk="Id", ts_field="SystemModstamp")
        back = spark.read.jdbc(dsn, "pgsf_test_customer", properties=sink.properties)
        got = {r["Id"]: (r["name"], r["bal"]) for r in back.collect()}
        assert got == {"c1": ("alice", 10.0), "c2": ("bob2", 25.0), "c3": ("carol", 30.0)}

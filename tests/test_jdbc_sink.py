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
    pg_create_table_sql,
    pg_literal,
    pg_type,
    staging_table_name,
)
from pgsf_spark.schema.sftypes import describe_to_struct

T0 = datetime(2024, 1, 1)


# A describe doc exercising every row of the reference's type table
# (createtable.py:13-35) plus the constraint paths (:72-84).
DESCRIBE_FIELDS = [
    {"name": "Id", "type": "id", "length": 18, "nillable": False},
    {"name": "Name", "type": "string", "length": 80, "nillable": False},
    {"name": "Email", "type": "email", "length": 128, "nillable": True,
     "unique": True, "IsIndexed": True},
    {"name": "Stage", "type": "picklist", "length": 255, "nillable": True,
     "defaultValue": "New"},
    {"name": "Employees", "type": "int", "nillable": True},
    {"name": "CloseDate", "type": "date", "nillable": True},
    {"name": "SystemModstamp", "type": "datetime", "nillable": False},
    {"name": "IsDeleted", "type": "boolean", "nillable": False,
     "defaultValue": False},
    {"name": "Amount", "type": "currency", "precision": 16, "scale": 2,
     "nillable": True},
    {"name": "Discount", "type": "percent", "nillable": True},
]


class TestPgDdl:
    def test_type_table_parity(self):
        """Each describe type lands on the reference's PG type
        (createtable.py:13-35), round-tripped through the Spark schema."""
        schema = describe_to_struct(DESCRIBE_FIELDS)
        by_name = {f.name: pg_type(f) for f in schema.fields}
        assert by_name["Id"] == "VARCHAR(18)"
        assert by_name["Name"] == "VARCHAR(80)"
        assert by_name["Email"] == "VARCHAR(128)"
        assert by_name["Stage"] == "TEXT"  # picklist: size not reliable
        assert by_name["Employees"] == "INTEGER"
        assert by_name["CloseDate"] == "DATE"
        assert by_name["SystemModstamp"] == "TIMESTAMP"
        assert by_name["IsDeleted"] == "BOOLEAN"
        assert by_name["Amount"] == "NUMERIC(16, 2)"
        assert by_name["Discount"] == "DOUBLE PRECISION"

    def test_create_table_constraints_and_indexes(self):
        schema = describe_to_struct(DESCRIBE_FIELDS)
        stmts = pg_create_table_sql(schema, "Account", pk="Id", grant_to="reporting")
        create = stmts[0]
        assert create.startswith('CREATE TABLE "Account" (')
        assert ' "Id" VARCHAR(18) PRIMARY KEY' in create
        assert ' "Name" VARCHAR(80) NOT NULL' in create
        assert ' "Email" VARCHAR(128) UNIQUE' in create
        assert " \"Stage\" TEXT DEFAULT 'New'" in create
        # falsy defaults are skipped exactly like the reference
        # (createtable.py:80 `if field['defaultValue']:`)
        assert ' "IsDeleted" BOOLEAN NOT NULL,' in create
        # IsIndexed -> secondary index; pk NOT re-indexed
        assert 'CREATE INDEX "Account_Email_idx" ON "Account" ("Email");' in stmts
        assert not any("Id_idx" in s for s in stmts)
        assert stmts[-1] == 'GRANT SELECT ON "Account" TO reporting;'

    def test_unsupported_type_raises(self, spark):
        from pyspark.sql.types import ArrayType, LongType, StructField, StructType

        schema = StructType([StructField("v", ArrayType(LongType()))])
        with pytest.raises(TypeError, match="NOT IMPLEMENTED"):
            pg_create_table_sql(schema, "t", pk=None)

    def test_literal_escapes(self):
        assert pg_literal("O'Brien") == "'O''Brien'"
        assert pg_literal(True) == "TRUE"
        assert pg_literal(3) == "3"


class TestWriterQuoting:
    """ADVICE r2: the JDBC writer and the generated SQL must resolve the
    SAME relation for mixed-case names -- df.write.jdbc gets the quoted
    identifier, matching the quoted names in the merge statements."""

    def _capture_writer(self, monkeypatch):
        calls = []

        def fake_jdbc(writer, url, table, mode=None, properties=None):
            calls.append({"table": table, "mode": mode})

        from pyspark.sql.readwriter import DataFrameWriter

        monkeypatch.setattr(DataFrameWriter, "jdbc", fake_jdbc)
        return calls

    def test_stage_and_full_load_quote_mixed_case(self, spark, monkeypatch):
        calls = self._capture_writer(monkeypatch)
        executed = []
        sink = JdbcPostgresSink("jdbc:postgresql://x/db", run_sql=executed.append)
        df = spark.createDataFrame([("c1",)], "Id string")
        sink.stage_changes(df, "Account")
        sink.full_load(df, "Account")
        assert calls[0]["table"] == '"tmp_Account"'
        assert calls[1]["table"] == '"Account"'
        assert executed[-1] == ['TRUNCATE TABLE "Account"']

    def test_full_load_create_runs_reference_ddl_first(self, spark, monkeypatch):
        calls = self._capture_writer(monkeypatch)
        executed = []
        sink = JdbcPostgresSink("jdbc:postgresql://x/db", run_sql=executed.append)
        schema = describe_to_struct(DESCRIBE_FIELDS)
        df = spark.createDataFrame([], schema)
        sink.full_load(df, "Account", create=True, pk="Id")
        assert executed[0][0].startswith('CREATE TABLE "Account"')
        assert executed[1] == ['TRUNCATE TABLE "Account"']
        assert calls[0] == {"table": '"Account"', "mode": "append"}


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


class TestSyncRunnerJdbcTarget:
    """SyncRunner routing through the JDBC sink (offline tier: writer
    captured, statements recorded -- the same recorder the live tier skips)."""

    def _env(self, spark, tmp_path, monkeypatch):
        from pyspark.sql.readwriter import DataFrameWriter

        from pgsf_spark.sources.entity import EntitySource
        from pgsf_spark.sync.runner import SyncRunner
        from pgsf_spark.sync.state import SyncState

        calls, executed = [], []

        def fake_jdbc(writer, url, table, mode=None, properties=None):
            calls.append({"table": table, "mode": mode})

        monkeypatch.setattr(DataFrameWriter, "jdbc", fake_jdbc)
        src_dir = tmp_path / "src"
        src_dir.mkdir()
        spark.createDataFrame(
            [("c1", 10.0, T0, False), ("c2", 20.0, T0, False)],
            "Id string, bal double, SystemModstamp timestamp, IsDeleted boolean",
        ).write.parquet(str(src_dir / "customer.parquet"))
        source = EntitySource(spark, str(src_dir))
        sink = JdbcPostgresSink("jdbc:postgresql://x/db", run_sql=executed.append)
        state = SyncState(str(tmp_path / "sync.json"))
        return SyncRunner(source, sink, state), src_dir, calls, executed, state

    def test_snapshot_then_incremental_merge(self, spark, tmp_path, monkeypatch):
        runner, src_dir, calls, executed, state = self._env(spark, tmp_path, monkeypatch)
        n = runner.snapshot_load("customer", refresh_minutes=0)
        assert n == 2
        assert executed[0] == ['TRUNCATE TABLE "customer"']
        assert calls[0] == {"table": '"customer"', "mode": "append"}
        # new change lands after the watermark
        t1 = datetime(2030, 1, 2)
        spark.createDataFrame(
            [("c1", 10.0, T0, False), ("c2", 99.0, t1, False), ("c3", 30.0, t1, False)],
            "Id string, bal double, SystemModstamp timestamp, IsDeleted boolean",
        ).write.mode("overwrite").parquet(str(src_dir / "customer.parquet"))
        out = runner.sync_table("customer")
        assert out["rows"] == 2  # c2 updated + c3 inserted
        assert out["watermark"] == t1.isoformat()
        # staged into tmp then the reference's merge transaction ran
        assert calls[-1] == {"table": '"tmp_customer"', "mode": "overwrite"}
        merge_stmts = executed[-1]
        assert merge_stmts[0].startswith('INSERT INTO "customer"')
        assert merge_stmts[-1] == 'DROP TABLE "tmp_customer"'
        assert state.get("customer").syncuntil_dt() == t1

    def test_empty_batch_keeps_watermark(self, spark, tmp_path, monkeypatch):
        runner, src_dir, calls, executed, state = self._env(spark, tmp_path, monkeypatch)
        runner.snapshot_load("customer", refresh_minutes=0)
        wm0 = state.get("customer").syncuntil_dt()
        out = runner.sync_table("customer")
        assert out["rows"] == 0
        assert state.get("customer").syncuntil_dt() == wm0


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

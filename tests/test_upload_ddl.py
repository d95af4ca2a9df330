"""Reverse-ETL chunked upload (K4) + DDL generation (K1) tests."""

import pytest

from pgsf_spark.operators.ddl import check_unique, get_create_table_sql
from pgsf_spark.operators.upload import (
    chunk_rows,
    parse_batch_result,
    upload_dataframe,
    upload_dataframe_with_results,
)
from pgsf_spark.schema.mapping import TableDesc

from tests.test_schema import DESCRIBE_CUSTOMER


class Row(dict):
    def __getitem__(self, k):
        return dict.__getitem__(self, k)


def rows(n):
    return [Row({"Id": f"id{i}", "v": i}) for i in range(n)]


class TestChunking:
    def test_record_cap(self):
        chunks = list(chunk_rows(rows(25), ["Id", "v"], max_records=10))
        assert len(chunks) == 3
        # header repeated per chunk (upload_table.py:63-66)
        assert all(c.startswith("Id,v\n") for c in chunks)
        assert sum(c.count("\n") - 1 for c in chunks) == 25

    def test_byte_cap(self):
        chunks = list(chunk_rows(rows(100), ["Id", "v"], max_bytes=120))
        assert len(chunks) > 1
        assert all(len(c.encode()) <= 120 + 40 for c in chunks)  # one row of slack by construction

    def test_single_oversized_row_still_emitted(self):
        big = [Row({"Id": "x" * 1000, "v": 1})]
        chunks = list(chunk_rows(big, ["Id", "v"], max_bytes=10))
        assert len(chunks) == 1  # never drops data

    def test_upload_dataframe_chunks(self, spark, tmp_path):
        df = spark.createDataFrame([(f"id{i}", i) for i in range(50)], "Id string, v int").coalesce(1)
        out = tmp_path / "posts"
        out.mkdir()

        outdir = str(out)

        def poster(chunk, _dir=outdir):
            import os
            import uuid

            with open(os.path.join(_dir, uuid.uuid4().hex), "w") as f:
                f.write(chunk)

        upload_dataframe(df, poster, max_records=20)
        files = list(out.iterdir())
        assert len(files) == 3  # 50 records / 20 cap
        total = sum(open(f).read().count("\n") - 1 for f in files)
        assert total == 50


RESULT_CSV = (
    '"Id","Success","Created","Error"\n'
    '"001xx0001","true","true",""\n'
    '"001xx0002","true","false",""\n'
    '"","false","false","REQUIRED_FIELD_MISSING:Required fields are missing: [Name]:Name --"\n'
)


class TestUploadResults:
    def test_parse_batch_result(self):
        # shape per salesforce_bulk.py:498-546 (Id, Success, Created, Error)
        recs = parse_batch_result(RESULT_CSV)
        assert recs == [
            {"id": "001xx0001", "success": True, "created": True, "error": None},
            {"id": "001xx0002", "success": True, "created": False, "error": None},
            {
                "id": None,
                "success": False,
                "created": False,
                "error": "REQUIRED_FIELD_MISSING:Required fields are missing: [Name]:Name --",
            },
        ]

    def test_parse_empty(self):
        assert parse_batch_result("") == []
        assert parse_batch_result('"Id","Success","Created","Error"\n') == []

    def test_upload_with_results_surfaces_per_record_outcomes(self, spark):
        df = spark.createDataFrame(
            [(f"id{i}", i) for i in range(30)], "Id string, v int"
        ).coalesce(1)

        def poster(chunk):
            # echo a result row per uploaded record; every 7th rejected
            lines = chunk.splitlines()[1:]
            out = ['"Id","Success","Created","Error"']
            for ln in lines:
                rid = ln.split(",")[0]
                if int(rid[2:]) % 7 == 0:
                    out.append(f'"","false","false","DUPLICATE_VALUE:{rid}"')
                else:
                    out.append(f'"{rid}","true","true",""')
            return "\n".join(out) + "\n"

        res = upload_dataframe_with_results(df, poster, max_records=10).collect()
        assert len(res) == 30
        failed = [r for r in res if not r["success"]]
        assert len(failed) == 5  # id0, id7, id14, id21, id28
        assert all(r["error"].startswith("DUPLICATE_VALUE") for r in failed)
        ok = {r["id"] for r in res if r["success"]}
        assert "id1" in ok and "id7" not in ok

    def test_upload_with_results_retries_connection_errors(self, spark):
        df = spark.createDataFrame([("a", 1)], "Id string, v int").coalesce(1)
        import os
        import tempfile

        marker = os.path.join(tempfile.mkdtemp(), "attempts")

        def flaky_poster(chunk, _marker=marker):
            import os as _os

            n = len(_os.listdir(_os.path.dirname(_marker)))
            open(f"{_marker}{n}", "w").close()
            if n == 0:
                raise ConnectionError("transient")
            return '"Id","Success","Created","Error"\n"a","true","true",""\n'

        res = upload_dataframe_with_results(df, flaky_poster).collect()
        assert [(r["id"], r["success"]) for r in res] == [("a", True)]


class TestDdl:
    def test_create_table_sql(self):
        td = TableDesc("Customer", DESCRIBE_CUSTOMER)
        stmts = get_create_table_sql(td, grant_to="reporting")
        ddl = stmts[0]
        assert "CREATE TABLE IF NOT EXISTS `Customer`" in ddl
        assert "`Id` string NOT NULL" in ddl
        assert "`Revenue__c` decimal(18,2)" in ddl
        assert "`FullLabel__c`" not in ddl  # calculated excluded
        assert "GRANT SELECT" in stmts[1]

    def test_ddl_executes_in_spark(self, spark, tmp_path):
        td = TableDesc("ddl_smoke", [
            {"name": "Id", "type": "id", "nillable": False},
            {"name": "SystemModstamp", "type": "datetime", "nillable": True},
        ])
        stmts = get_create_table_sql(td, location=str(tmp_path / "tbl"))
        spark.sql(stmts[0])
        try:
            assert spark.table("ddl_smoke").schema.fieldNames() == ["Id", "SystemModstamp"]
        finally:
            spark.sql("DROP TABLE IF EXISTS ddl_smoke")

    def test_check_unique(self, spark):
        df = spark.createDataFrame([("a",), ("a",), ("b",)], "Id string")
        dupes = check_unique(df, ["Id"]).collect()
        assert len(dupes) == 1 and dupes[0]["Id"] == "a"


class TestDdlEscaping:
    def test_comment_quote_escaped(self):
        td = TableDesc(
            "T",
            [
                {
                    "name": "Name",
                    "type": "string",
                    "nillable": True,
                    "defaultValue": "O'Brien",
                }
            ],
        )
        ddl = get_create_table_sql(td)[0]
        assert "O''Brien" in ddl  # doubled, valid SQL
        assert "COMMENT 'default=\"O'Brien\"'" not in ddl

"""Entity source + pgsf CSV dialect tests (S3/S4/S9, P1/P3/P6, F1/F2/F5)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from pgsf_spark.sources.csv_io import read_pgsf_csv, write_pgsf_csv
from pgsf_spark.sources.entity import EntitySource

from tests.conftest import SF_DIR

T0 = datetime(2024, 1, 1, 0, 0, 0)


@pytest.fixture(scope="module")
def source(spark):
    return EntitySource(spark, SF_DIR)


class TestEntitySource:
    def test_projection_pushdown(self, spark, source):
        df = source.load("customer", fields=["c_custkey", "c_name"])
        assert df.columns == ["c_custkey", "c_name"]
        # column pruning must reach the parquet scan (SURVEY §4)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ReadSchema: struct<c_custkey:bigint,c_name:string>" in plan

    def test_filter_pushdown(self, spark, source):
        df = source.load("customer", where="c_custkey < 10")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(c_custkey), LessThan(c_custkey,10)]" in plan
        assert df.count() == df.filter("c_custkey < 10").count()

    def test_limit(self, source):
        assert source.load("orders", limit=7).count() == 7

    def test_count_only(self, source):
        assert source.count("orders") == 1500

    def test_include_deleted_soft_delete_filter(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("a", False), ("b", True)], "Id string, IsDeleted boolean"
        )
        df.write.parquet(str(tmp_path / "t.parquet"))
        src = EntitySource(spark, str(tmp_path))
        assert src.load("t").count() == 1  # REST `query` hides deleted
        assert src.load("t", include_deleted=True).count() == 2  # queryAll

    def test_incremental_strictly_greater_second_truncation(self, spark, tmp_path):
        # P4: watermark truncated to seconds; strictly >
        rows = [
            ("a", datetime(2024, 1, 1, 0, 0, 10)),
            ("b", datetime(2024, 1, 1, 0, 0, 11)),
        ]
        spark.createDataFrame(rows, "Id string, SystemModstamp timestamp").write.parquet(
            str(tmp_path / "t.parquet")
        )
        src = EntitySource(spark, str(tmp_path))
        # watermark 00:00:10.900 -> truncates to 00:00:10 -> both the .10 row
        # (==) excluded, the .11 row included
        got = {r["Id"] for r in src.incremental("t", "SystemModstamp", datetime(2024, 1, 1, 0, 0, 10, 900000)).collect()}
        assert got == {"b"}


class TestCsvDialect:
    def test_round_trip_fidelity(self, spark, tmp_path):
        # FIXTURES.md §5: quotes, commas, newlines, t/f, NULL vs empty, NUL strip
        df = spark.createDataFrame(
            [
                ("a", 'say "hi", ok', True, datetime(2019, 11, 18, 15, 28, 14), 1.5),
                ("b", "line1\nline2", False, None, None),
                ("c", "nul\x00byte", None, datetime(2024, 1, 1), 0.0),
                ("d", None, True, datetime(2024, 6, 30, 23, 59, 59), -2.25),
            ],
            "Id string, txt string, flag boolean, ts timestamp, num double",
        )
        path = str(tmp_path / "out_csv")
        write_pgsf_csv(df, path)
        back = read_pgsf_csv(spark, path, df.schema)
        got = {r["Id"]: r for r in back.collect()}
        assert got["a"]["txt"] == 'say "hi", ok'
        assert got["b"]["txt"] == "line1\nline2"
        assert got["c"]["txt"] == "nulbyte"  # NUL stripped (F1)
        assert got["d"]["txt"] is None  # empty == NULL (FORCE_NULL)
        assert got["a"]["flag"] is True and got["b"]["flag"] is False and got["c"]["flag"] is None
        assert got["a"]["ts"] == datetime(2019, 11, 18, 15, 28, 14)
        assert got["b"]["ts"] is None
        assert got["d"]["num"] == -2.25

    def test_boolean_rendered_t_f(self, spark, tmp_path):
        # the landed file must literally contain t/f (query_poll_table.py:46-47)
        df = spark.createDataFrame([("a", True), ("b", False)], "Id string, flag boolean")
        path = str(tmp_path / "bool_csv")
        write_pgsf_csv(df, path)
        import glob

        # NB: Spark quotes minimally (RFC4180); under COPY+FORCE_NULL this is
        # semantically identical to the reference's always-quoted strings.
        text = "".join(open(f).read() for f in glob.glob(path + "/part-*")).replace("\r", "")
        assert "a,t\n" in text and "b,f\n" in text

    def test_datetime_rendered_ms_z(self, spark, tmp_path):
        # 2019-11-18T15:28:14.000Z rendering (query_poll_table.py:44-45)
        df = spark.createDataFrame([("a", datetime(2019, 11, 18, 15, 28, 14))], "Id string, ts timestamp")
        path = str(tmp_path / "dt_csv")
        write_pgsf_csv(df, path)
        import glob

        text = "".join(open(f).read() for f in glob.glob(path + "/part-*"))
        assert "2019-11-18T15:28:14.000Z" in text


class TestCdcIdScans:
    def test_updated_and_deleted_ids(self, spark, tmp_path):
        from datetime import datetime

        rows = [
            ("a", datetime(2024, 1, 1), False),
            ("b", datetime(2024, 1, 2), False),
            ("c", datetime(2024, 1, 3), True),
            ("d", datetime(2024, 1, 9), True),
        ]
        spark.createDataFrame(rows, "Id string, SystemModstamp timestamp, IsDeleted boolean").write.parquet(
            str(tmp_path / "t.parquet")
        )
        src = EntitySource(spark, str(tmp_path))
        upd = {r["Id"] for r in src.updated_ids("t", datetime(2024, 1, 2), datetime(2024, 1, 5)).collect()}
        assert upd == {"b", "c"}  # window inclusive, deleted rows included
        dele = {r["Id"] for r in src.deleted_ids("t", datetime(2024, 1, 1), datetime(2024, 1, 5)).collect()}
        assert dele == {"c"}


class TestFixedWidth:
    def test_roundtrip_and_alignment(self, spark, tmp_path):
        from pgsf_spark.sources.fixedwidth_io import FwField, read_fixed_width, write_fixed_width

        df = spark.createDataFrame(
            [(1, "alice", -250), (42, "bob", 9)], "k long, name string, cents long"
        )
        fields = [
            FwField("k", 6, "bigint", "right"),
            FwField("name", 10, "string", "left"),
            FwField("cents", 8, "bigint", "right"),
        ]
        p = str(tmp_path / "fw")
        write_fixed_width(df, fields, p)
        # raw layout: right-aligned numerics, left-aligned text, fixed offsets
        lines = {r["value"] for r in spark.read.text(p).collect()}
        assert "     1" + "alice     " + "    -250" in lines
        assert "    42" + "bob       " + "       9" in lines
        back = {(r["k"], r["name"], r["cents"]) for r in read_fixed_width(spark, p, fields).collect()}
        assert back == {(1, "alice", -250), (42, "bob", 9)}

    def test_overflow_raises(self, spark, tmp_path):
        import pytest as _pytest

        from pgsf_spark.sources.fixedwidth_io import FwField, write_fixed_width

        df = spark.createDataFrame([("toolongvalue",)], "name string")
        with _pytest.raises(Exception, match="fixed-width overflow"):
            write_fixed_width(df, [FwField("name", 4)], str(tmp_path / "fw2"))

    def test_null_roundtrip(self, spark, tmp_path):
        # NULL encodes as all-spaces and reads back as NULL; the rest of the
        # record survives (ADVICE r3: concat() previously nulled the line)
        from pgsf_spark.sources.fixedwidth_io import FwField, read_fixed_width, write_fixed_width

        df = spark.createDataFrame(
            [(1, None, None), (2, "bob", 7)], "k long, name string, cents long"
        )
        fields = [
            FwField("k", 4, "bigint", "right"),
            FwField("name", 6, "string", "left"),
            FwField("cents", 6, "bigint", "right"),
        ]
        p = str(tmp_path / "fwn")
        write_fixed_width(df, fields, p)
        lines = {r["value"] for r in spark.read.text(p).collect()}
        assert "   1" + "      " + "      " in lines
        back = {tuple(r) for r in read_fixed_width(spark, p, fields).collect()}
        assert back == {(1, None, None), (2, "bob", 7)}

    def test_alignment_side_spaces_survive(self, spark, tmp_path):
        # only the padding side is trimmed on read: leading spaces of a
        # left-aligned value are significant and roundtrip intact
        from pgsf_spark.sources.fixedwidth_io import FwField, read_fixed_width, write_fixed_width

        df = spark.createDataFrame([("  ind",)], "name string")
        fields = [FwField("name", 8, "string", "left")]
        p = str(tmp_path / "fws")
        write_fixed_width(df, fields, p)
        assert [r["name"] for r in read_fixed_width(spark, p, fields).collect()] == ["  ind"]

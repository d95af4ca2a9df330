"""SOQL-subset translator tests (S3/S4/P3/P6 query shapes, §3.3)."""

import pytest

from pgsf_spark.soql import SoqlError, SoqlQuery, run_soql

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def loader(spark):
    def load(table):
        return spark.read.parquet(f"{SF_DIR}/{table}.parquet")

    return load


class TestParse:
    def test_basic(self):
        q = SoqlQuery.parse("SELECT c_custkey, c_name FROM customer")
        assert q.table == "customer" and q.fields == ["c_custkey", "c_name"]
        assert q.where is None and q.limit is None and not q.is_count

    def test_where_limit(self):
        q = SoqlQuery.parse("SELECT a FROM t WHERE x > 5 AND y = 'z' LIMIT 10")
        assert q.where == "x > 5 AND y = 'z'" and q.limit == 10

    def test_count(self):
        q = SoqlQuery.parse("SELECT COUNT() FROM t WHERE x < 3")
        assert q.is_count and q.fields == []

    def test_rejects_unsupported(self):
        with pytest.raises(SoqlError):
            SoqlQuery.parse("SELECT a, MAX(b) FROM t")
        with pytest.raises(SoqlError):
            SoqlQuery.parse("DELETE FROM t")


class TestRun:
    def test_projection_and_filter(self, loader):
        df = run_soql(loader, "SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 3")
        rows = df.collect()
        assert df.columns == ["c_custkey", "c_name"] and len(rows) == 4  # keys 0..3

    def test_count(self, loader):
        n = run_soql(loader, "SELECT COUNT() FROM orders")
        assert n == 1500

    def test_limit(self, loader):
        assert run_soql(loader, "SELECT o_orderkey FROM orders LIMIT 5").count() == 5

    def test_unknown_field(self, loader):
        with pytest.raises(SoqlError):
            run_soql(loader, "SELECT nope FROM customer")

    def test_include_deleted(self, spark):
        df = spark.createDataFrame([("a", False), ("b", True)], "Id string, IsDeleted boolean")

        def load(_):
            return df

        assert run_soql(load, "SELECT Id FROM t").count() == 1
        assert run_soql(load, "SELECT Id FROM t", include_deleted=True).count() == 2


class TestSosl:
    @staticmethod
    def _tables(spark):
        customer = spark.createDataFrame(
            [
                ("c1", "Alice Smith", 10.0, False),
                ("c2", "Bob Smithers", 20.0, False),
                ("c3", "Carol Jones", 30.0, False),
                ("c4", "Dan Smith", 40.0, True),  # soft-deleted
            ],
            "Id string, Name string, bal double, IsDeleted boolean",
        )
        notes = spark.createDataFrame(
            [("n1", "call smith tomorrow"), ("n2", "unrelated")],
            "Id string, Body string",
        )
        return {"customer": customer, "notes": notes}

    def test_find_all_fields_multi_table(self, spark):
        from pgsf_spark.soql import run_sosl

        tables = self._tables(spark)
        res = run_sosl(tables.__getitem__, "FIND {Smith} IN ALL FIELDS RETURNING customer(Id, Name), notes(Id)")
        assert {r["Id"] for r in res["customer"].collect()} == {"c1", "c2"}  # c4 deleted
        assert [r["Id"] for r in res["notes"].collect()] == ["n1"]  # case-insensitive

    def test_name_fields_scope_and_where(self, spark):
        from pgsf_spark.soql import run_sosl

        tables = self._tables(spark)
        res = run_sosl(
            tables.__getitem__,
            "FIND {smith} IN NAME FIELDS RETURNING customer(Id WHERE bal > 15)",
        )
        assert {r["Id"] for r in res["customer"].collect()} == {"c2"}

    def test_include_deleted(self, spark):
        from pgsf_spark.soql import run_sosl

        tables = self._tables(spark)
        res = run_sosl(
            tables.__getitem__,
            "FIND {Smith} RETURNING customer(Id)",
            include_deleted=True,
        )
        assert {r["Id"] for r in res["customer"].collect()} == {"c1", "c2", "c4"}

    def test_requires_returning(self, spark):
        from pgsf_spark.soql import SoqlError, run_sosl

        with pytest.raises(SoqlError):
            run_sosl(lambda t: None, "FIND {x}")

    def test_bad_shape(self, spark):
        from pgsf_spark.soql import SoqlError, SoslQuery

        with pytest.raises(SoqlError):
            SoslQuery.parse("SEEK {x} RETURNING t")


class TestQueryAllAndPaging:
    def test_soql_all_includes_deleted(self, spark):
        from pgsf_spark.soql import run_soql, run_soql_all

        df = spark.createDataFrame(
            [("a", False), ("b", True)], "Id string, IsDeleted boolean"
        )
        assert run_soql(lambda t: df, "SELECT COUNT() FROM t") == 1
        assert run_soql_all(lambda t: df, "SELECT COUNT() FROM t") == 2

    def test_query_pages(self, spark):
        from pgsf_spark.soql import query_pages

        df = spark.range(0, 25).selectExpr("CAST(id AS STRING) AS Id")
        pages = list(query_pages(df, page_size=10))
        assert [len(p) for p in pages] == [10, 10, 5]
        assert {r["Id"] for p in pages for r in p} == {str(i) for i in range(25)}

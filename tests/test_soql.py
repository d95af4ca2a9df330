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

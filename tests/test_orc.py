"""ORC source/sink round trip: Spark's built-in columnar alternative to
parquet must read back bit-identical (schema, count, content hash) so the
engine's tables can land in either format."""

from pyspark.sql import functions as F

from pgsf_spark.tables import TABLES, load_table

SF = "/root/testdata/sf0.001"


class TestOrcRoundTrip:
    def test_documents_roundtrip_hash_identical(self, spark, tmp_path):
        src = load_table(spark, SF, "documents")
        src.write.mode("overwrite").orc(str(tmp_path / "documents.orc"))
        back = spark.read.orc(str(tmp_path / "documents.orc"))
        assert back.schema == src.schema
        assert back.count() == src.count()

        def content_hash(df):
            cols = sorted(df.columns)
            h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
            return df.select(F.sum(F.conv(F.substring(h, 1, 8), 16, 10).cast("long")).alias("s")).collect()[0].s

        assert content_hash(back) == content_hash(src)

    def test_all_tables_roundtrip_counts(self, spark, tmp_path):
        for t in TABLES:
            src = load_table(spark, SF, t)
            p = str(tmp_path / f"{t}.orc")
            src.write.mode("overwrite").orc(p)
            assert spark.read.orc(p).count() == src.count()

"""JSONL source/sink: escaping fidelity and parquet landing."""

from pyspark.sql import functions as F

from pgsf_spark.sources.jsonl_io import land_jsonl, read_jsonl, write_jsonl


class TestJsonlRoundtrip:
    def test_adversarial_strings_survive(self, spark, tmp_path):
        rows = [
            (1, 'quote " backslash \\ tab \t', "en"),
            (2, "newline\ninside", "de"),
            (3, "unicode é中文 emoji \U0001f600", "fr"),
            (4, None, None),  # NULLs must round-trip as NULLs, not "null"
            (5, "", "en"),  # empty string must stay distinct from NULL
        ]
        schema = "doc_id long, text string, lang string"
        df = spark.createDataFrame(rows, schema)
        path = str(tmp_path / "docs.jsonl")
        write_jsonl(df, path)
        back = read_jsonl(spark, path, df.schema)
        got = {r["doc_id"]: (r["text"], r["lang"]) for r in back.collect()}
        assert got == {i: (t, l) for i, t, l in rows}

    def test_land_jsonl_parquet(self, spark, tmp_path):
        schema = "doc_id long, text string, lang string"
        df = spark.createDataFrame([(1, "a b", "en"), (2, None, "de")], schema)
        src = str(tmp_path / "in.jsonl")
        dest = str(tmp_path / "landed")
        write_jsonl(df, src)
        land_jsonl(spark, src, df.schema, dest)
        landed = spark.read.parquet(dest)
        assert landed.count() == 2
        assert landed.filter(F.col("text").isNull()).count() == 1
        assert dict(landed.dtypes)["doc_id"] == "bigint"

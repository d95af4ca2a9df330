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


class TestJsonlMalformed:
    def test_malformed_lines_become_null_rows(self, spark, tmp_path):
        import os

        src = tmp_path / "mixed"
        src.mkdir()
        with open(src / "part-00000.json", "w") as f:
            f.write('{"doc_id": 1, "text": "good", "lang": "en"}\n')
            f.write("this is not json\n")
            f.write('{"doc_id": 2, "text": "also good", "lang": "de"}\n')
        schema = spark.createDataFrame([], "doc_id long, text string, lang string").schema
        back = spark.read.schema(schema).json(str(src))
        rows = back.collect()
        # permissive mode: the bad line surfaces as an all-null row, the
        # good rows parse -- callers count nulls in a required column to
        # detect corruption instead of losing the whole scan
        assert len(rows) == 3
        good = {r["doc_id"] for r in rows if r["doc_id"] is not None}
        assert good == {1, 2}
        assert sum(1 for r in rows if r["doc_id"] is None) == 1

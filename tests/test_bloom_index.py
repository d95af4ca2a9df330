"""Per-file bloom index (TableStore.build_bloom_index/read_bloom_pruned):
point lookups on a hash-scattered secondary column skip files that min/max
range stats cannot, and the pruned result always equals the plain filter."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pgsf_spark.operators.table_store import TableStore


@pytest.fixture()
def scattered_store(spark, tmp_path):
    """8 files, DISJOINT user sets per file, but every file's [min, max]
    spans nearly the whole domain -- range stats are useless here."""
    store = TableStore(spark, str(tmp_path / "store"))
    rows = [(u, u % 97, f"payload{u}") for u in range(1000)]
    df = spark.createDataFrame(rows, "user_id long, k int, payload string")
    store.write(df.repartition(8, "user_id"), "events", layout_ready=True)
    return spark, store


class TestBloomIndex:
    def test_lookup_equals_plain_filter_and_prunes_files(self, scattered_store):
        spark, store = scattered_store
        n_files = store.build_bloom_index("events", "user_id")
        assert n_files == 8
        for victim in (0, 123, 999):
            got = sorted(map(tuple, store.read_bloom_pruned("events", "user_id", victim).collect()))
            want = sorted(
                map(tuple, store.read("events").filter(F.col("user_id") == victim).collect())
            )
            assert got == want and len(got) == 1
        # the index actually prunes: the admitted file set for a present key
        # is far smaller than all files (bloom FP rate ~per-mille at this n)
        path = store.current_version_path("events")
        with open(os.path.join(path, "_BLOOM_user_id.json")) as f:
            index = json.load(f)
        assert len(index) == 8
        pruned = store.read_bloom_pruned("events", "user_id", 123)
        files_read = {r[0] for r in pruned.select(F.input_file_name()).distinct().collect()}
        assert len(files_read) <= 2  # 1 true file + rare false positives

    def test_absent_key_returns_empty(self, scattered_store):
        spark, store = scattered_store
        store.build_bloom_index("events", "user_id")
        assert store.read_bloom_pruned("events", "user_id", 10**9).count() == 0

    def test_missing_index_falls_back(self, scattered_store):
        spark, store = scattered_store
        got = store.read_bloom_pruned("events", "user_id", 5).collect()
        assert len(got) == 1 and got[0].user_id == 5

    def test_range_stats_cannot_prune_this_layout(self, scattered_store):
        # the motivating contrast: every file overlaps [lo, hi], so
        # read_pruned keeps all files while the bloom keeps ~1
        spark, store = scattered_store
        stats = store.file_stats("events")
        spans = [s["user_id"] for s in stats.values() if "user_id" in s]
        assert all(mx - mn > 900 for mn, mx in spans)

    def test_null_values_in_indexed_column(self, spark, tmp_path):
        # ADVICE r4: _positions(NULL) explodes to NULL positions whose
        # all-NULL bit_or group crashed int(w). NULLs carry no equality
        # information, so the build must skip them -- and an all-NULL file
        # gets no entry (correctly pruned for every point probe).
        store = TableStore(spark, str(tmp_path / "store"))
        rows = [(u, f"p{u}") for u in range(50)] + [(None, "nullrow")] * 5
        df = spark.createDataFrame(rows, "user_id long, payload string")
        store.write(df.repartition(4), "events", layout_ready=True)
        store.build_bloom_index("events", "user_id")  # must not raise
        got = store.read_bloom_pruned("events", "user_id", 7).collect()
        assert len(got) == 1 and got[0].user_id == 7

    def test_probe_hash_matches_build_for_non_string_types(self, spark, tmp_path):
        # ADVICE r4: the probe hashed Python str(value) ('True') while the
        # build hashed Spark's cast ('true'), so every boolean/float lookup
        # pruned ALL files and silently returned empty. The probe must go
        # through the same Spark expression as the build.
        store = TableStore(spark, str(tmp_path / "store"))
        rows = [(i, i % 2 == 0, float(i) + 0.1) for i in range(100)]
        df = spark.createDataFrame(rows, "id long, flag boolean, score double")
        store.write(df.repartition(4), "t", layout_ready=True)
        for col, value, want in (
            ("flag", True, 50),
            ("flag", False, 50),
            ("score", 3.1, 1),
        ):
            store.build_bloom_index("t", col)
            got = store.read_bloom_pruned("t", col, value)
            plain = store.read("t").filter(F.col(col) == F.lit(value))
            assert got.count() == plain.count() == want, (col, value)
        # a NULL probe degrades to the (empty) exact filter, never crashes
        assert store.read_bloom_pruned("t", "flag", None).count() == 0

    def test_corrupt_index_falls_back(self, scattered_store):
        spark, store = scattered_store
        store.build_bloom_index("events", "user_id")
        path = store.current_version_path("events")
        with open(os.path.join(path, "_BLOOM_user_id.json"), "w") as f:
            f.write('{"truncated')  # simulate a crash mid-write of old code
        got = store.read_bloom_pruned("events", "user_id", 7).collect()
        assert len(got) == 1 and got[0].user_id == 7

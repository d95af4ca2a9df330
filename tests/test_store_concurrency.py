"""Optimistic concurrency on TableStore publish (Delta-style CAS in
miniature): a writer that read version X publishes only if X is still
current -- the loser of a race gets ConcurrentWriteError instead of
silently overwriting (write) or resurrecting stale carried bytes
(write_partial, where a lost update would corrupt data, not just lineage).
"""

import multiprocessing
import os

import pytest
from pyspark.sql import functions as F

from pgsf_spark.operators.table_store import ConcurrentWriteError, TableStore


def _race_worker(root, idx, barrier, q):
    # _publish with collect_stats=False touches only the filesystem, so the
    # cross-process race needs no SparkSession in the children
    store = TableStore(None, root, collect_stats=False)
    base = store.current_version("t")
    version = f"v_race_{idx}"
    path = os.path.join(root, "t", version)
    os.makedirs(path)
    barrier.wait()  # maximize overlap: everyone read 'base' before anyone flips
    try:
        store._publish("t", version, path, {}, {}, expect_version=base)
        q.put("won")
    except ConcurrentWriteError:
        q.put("lost")


class TestCasPublish:
    def _seed(self, tmp_path) -> TableStore:
        store = TableStore(None, str(tmp_path / "store"), collect_stats=False)
        path = os.path.join(store.root, "t", "v0")
        os.makedirs(path)
        store._publish("t", "v0", path, {}, {})
        return store

    def test_exactly_one_process_wins(self, tmp_path):
        store = self._seed(tmp_path)
        ctx = multiprocessing.get_context("fork")
        n = 6
        barrier = ctx.Barrier(n)
        q = ctx.Queue()
        procs = [
            ctx.Process(target=_race_worker, args=(store.root, i, barrier, q))
            for i in range(n)
        ]
        for p in procs:
            p.start()
        results = [q.get(timeout=30) for _ in procs]
        for p in procs:
            p.join(timeout=30)
        assert results.count("won") == 1, results
        assert results.count("lost") == n - 1, results
        # the table points at the single winner's version
        assert store.current_version("t").startswith("v_race_")

    def test_stale_expectation_raises_and_pointer_unchanged(self, tmp_path):
        store = self._seed(tmp_path)
        path = os.path.join(store.root, "t", "v1")
        os.makedirs(path)
        store._publish("t", "v1", path, {}, {}, expect_version="v0")
        assert store.current_version("t") == "v1"
        # a writer still holding the v0 token must lose, loudly
        path2 = os.path.join(store.root, "t", "v2")
        os.makedirs(path2)
        with pytest.raises(ConcurrentWriteError, match="expected current version 'v0'"):
            store._publish("t", "v2", path2, {}, {}, expect_version="v0")
        assert store.current_version("t") == "v1"

    def test_expect_none_means_create_only(self, tmp_path):
        store = TableStore(None, str(tmp_path / "store"), collect_stats=False)
        path = os.path.join(store.root, "t", "v0")
        os.makedirs(path)
        store._publish("t", "v0", path, {}, {}, expect_version=None)  # creates
        path1 = os.path.join(store.root, "t", "v1")
        os.makedirs(path1)
        with pytest.raises(ConcurrentWriteError):
            store._publish("t", "v1", path1, {}, {}, expect_version=None)


class TestWritePathsCas:
    def test_write_with_token_and_stale_token(self, spark, tmp_path):
        store = TableStore(spark, str(tmp_path / "store"))
        df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("x"))
        store.write(df, "t", expect_version=None)
        tok = store.current_version("t")
        store.write(df, "t", expect_version=tok)  # fresh token: fine
        with pytest.raises(ConcurrentWriteError):
            store.write(df, "t", expect_version=tok)  # now stale
        # default stays last-writer-wins for single-writer pipelines
        store.write(df, "t")

    def test_write_partial_cas_is_automatic(self, spark, tmp_path):
        # write_partial hardlink-carries from the version it read: publishing
        # over a newer version would resurrect stale bytes. The CAS is
        # therefore ON by default -- an explicitly stale token must raise.
        store = TableStore(spark, str(tmp_path / "store"))
        df = spark.range(20).select(
            F.col("id"), (F.col("id") % 4).alias("b"), (F.col("id") * 3).alias("x")
        )
        store.write(df, "t", partition_by=["b"])
        old = store.current_version("t")
        store.write(df, "t", partition_by=["b"])  # concurrent full refresh
        changed = df.filter(F.col("b") == 0)
        with pytest.raises(ConcurrentWriteError):
            store.write_partial(changed, "t", "b", [0], expect_version=old)
        # based on the CURRENT version it just read: publishes fine
        store.write_partial(changed, "t", "b", [0])
        got = store.read("t").count()
        assert got == 20


class TestUncheckedPublishSerializes:
    def test_unchecked_flip_waits_for_publish_lock(self, tmp_path):
        # ADVICE r5 (medium): an UNCHECKED publish that flips the pointer
        # outside _PUBLISH_LOCK can land between a CAS writer's
        # current_version check and its os.replace -- a silent lost update
        # with no ConcurrentWriteError raised anywhere. The fix routes every
        # flip through the flock; this test holds the lock and asserts the
        # unchecked publish blocks until release instead of sneaking past.
        import fcntl
        import threading

        store = TableStore(None, str(tmp_path / "store"), collect_stats=False)
        path0 = os.path.join(store.root, "t", "v0")
        os.makedirs(path0)
        store._publish("t", "v0", path0, {}, {})

        path1 = os.path.join(store.root, "t", "v1")
        os.makedirs(path1)
        done = threading.Event()

        def unchecked():
            store._publish("t", "v1", path1, {}, {})  # default: unchecked
            done.set()

        lock_path = os.path.join(store.root, "t", "_PUBLISH_LOCK")
        with open(lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            t = threading.Thread(target=unchecked, daemon=True)
            t.start()
            # flock is per open-file-description, so the thread's fresh fd
            # must block against ours even within one process
            assert not done.wait(0.6), "unchecked publish bypassed _PUBLISH_LOCK"
            assert store.current_version("t") == "v0"
            fcntl.flock(lk, fcntl.LOCK_UN)
        assert done.wait(10), "unchecked publish never completed after release"
        t.join(timeout=10)
        assert store.current_version("t") == "v1"

"""Schema-drift ingest gate (PERF.md round-14 plan item 1, built early).

The reference's sync loop has an OPEN TODO for this exact failure
(reference query_poll_table.py:202 'detect some errors like a column
that disapeared'): source schema drift surfaces as an opaque driver
error from cron and retries forever. pgsf_spark classifies the drift
BEFORE the merge touches data (schema/drift.py), routes it by policy
(SyncRunner.sync_table), and ledgers every absorbed drift in the
published version's manifest.
"""

from datetime import datetime, timedelta

import pytest

from pgsf_spark.operators.merge import SchemaDriftError, merge_upsert
from pgsf_spark.operators.table_store import TableStore
from pgsf_spark.schema.drift import classify_drift
from pgsf_spark.sources.entity import EntitySource
from pgsf_spark.sync.runner import SyncRunner
from pgsf_spark.sync.state import SyncState

T0 = datetime(2024, 1, 1, 0, 0, 0)
T1 = T0 + timedelta(hours=1)

BASE_SCHEMA = "Id string, name string, bal double, SystemModstamp timestamp, IsDeleted boolean"


class TestClassifier:
    def _schemas(self, spark, a: str, b: str):
        return (
            spark.createDataFrame([], a).schema,
            spark.createDataFrame([], b).schema,
        )

    def test_no_drift(self, spark):
        t, b = self._schemas(spark, "a long, b string", "a long, b string")
        report = classify_drift(t, b)
        assert not report
        assert report.describe() == "no drift"
        assert report.manifest_entry() == {}

    def test_added_removed_retyped_classified(self, spark):
        t, b = self._schemas(
            spark, "a long, b string, c double", "a long, b int, d boolean"
        )
        report = classify_drift(t, b)
        assert report.added == (("d", "boolean"),)
        assert report.removed == (("c", "double"),)
        assert report.retyped == (("b", "string", "int"),)
        entry = report.manifest_entry()
        assert entry["added"] == [{"column": "d", "type": "boolean"}]
        assert entry["removed"] == [{"column": "c", "type": "double"}]
        assert entry["retyped"] == [{"column": "b", "from": "string", "to": "int"}]

    def test_ignore_set_excludes_internal_columns(self, spark):
        t, b = self._schemas(spark, "a long, __pgsf_bucket int", "a long, _file_order long")
        report = classify_drift(t, b, ignore={"__pgsf_bucket", "_file_order"})
        assert not report

    def test_decimal_precision_change_is_drift(self, spark):
        t, b = self._schemas(spark, "a decimal(10,2)", "a decimal(12,2)")
        report = classify_drift(t, b)
        assert report.retyped == (("a", "decimal(10,2)", "decimal(12,2)"),)


class TestMergeRetypeGuard:
    def test_retyped_column_always_raises(self, spark):
        target = spark.createDataFrame([("c1", 10.0, T0)], "Id string, bal double, ts timestamp")
        changes = spark.createDataFrame([("c1", "11", T1)], "Id string, bal string, ts timestamp")
        for mode in ("add", "ignore", "strict"):
            with pytest.raises(SchemaDriftError, match="retyped"):
                merge_upsert(target, changes, pk="Id", ts_field="ts", schema_evolution=mode)

    def test_silent_widening_coercion_is_blocked_too(self, spark):
        # int -> bigint would union without error (Spark coerces) -- the
        # guard must still fire: a type change under the replica's
        # readers is an operator decision, never an implicit cast
        target = spark.createDataFrame([("c1", 1, T0)], "Id string, n int, ts timestamp")
        changes = spark.createDataFrame([("c1", 2, T1)], "Id string, n long, ts timestamp")
        with pytest.raises(SchemaDriftError, match="retyped"):
            merge_upsert(target, changes, pk="Id", ts_field="ts")


@pytest.fixture()
def env(spark, tmp_path):
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    snapshot = spark.createDataFrame(
        [
            ("c1", "alice", 10.0, T0, False),
            ("c2", "bob", 20.0, T0, False),
        ],
        BASE_SCHEMA,
    )
    snapshot.write.parquet(str(src_dir / "customer.parquet"))
    source = EntitySource(spark, str(src_dir))
    store = TableStore(spark, str(tmp_path / "store"))
    state = SyncState(str(tmp_path / "sync.json"))
    return spark, source, store, state, src_dir


def _drift_source(spark, src_dir, schema: str, rows):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(src_dir / "customer.parquet")
    )


class TestSyncDriftRouting:
    """End-to-end: snapshot, then a drifted incremental batch."""

    def _boot(self, env, **runner_kw):
        spark, source, store, state, src_dir = env
        runner = SyncRunner(source, store, state, **runner_kw)
        runner.snapshot_load("customer")
        # rewind the watermark to T0 so the next poll sees the T1 batch
        state.release("customer", syncuntil=T0, touch_refresh=False)
        return spark, source, store, state, src_dir, runner

    def test_added_column_widens_and_ledgers(self, env):
        spark, source, store, state, src_dir, runner = self._boot(env)
        _drift_source(
            spark,
            src_dir,
            "Id string, name string, bal double, tier string, SystemModstamp timestamp, IsDeleted boolean",
            [("c1", "alice", 11.0, "gold", T1, False)],
        )
        out = runner.sync_table("customer")
        assert out["rows"] == 2
        got = {r["Id"]: r for r in store.read("customer").collect()}
        assert got["c1"]["tier"] == "gold"
        assert got["c2"]["tier"] is None  # pre-drift rows widen with NULL
        drift = store.manifest("customer").get("schema_drift")
        assert drift == {"added": [{"column": "tier", "type": "string"}]}

    def test_removed_column_fails_loudly_by_default(self, env):
        spark, source, store, state, src_dir, runner = self._boot(env)
        _drift_source(
            spark,
            src_dir,
            "Id string, name string, SystemModstamp timestamp, IsDeleted boolean",
            [("c1", "alice2", T1, False)],
        )
        before = state.get("customer").syncuntil_dt()
        with pytest.raises(SchemaDriftError, match="removed.*bal"):
            runner.sync_table("customer")
        row = state.get("customer")
        assert row.status == "ready"  # claim released for retry
        assert row.syncuntil_dt() == before  # watermark never advanced
        # the replica is untouched: still 2 rows with bal intact
        got = {r["Id"]: r["bal"] for r in store.read("customer").collect()}
        assert got == {"c1": 10.0, "c2": 20.0}

    def test_removed_column_ledgered_under_allow_removed(self, env):
        spark, source, store, state, src_dir, runner0 = self._boot(env)
        runner = SyncRunner(source, store, state, drift_policy="allow-removed")
        _drift_source(
            spark,
            src_dir,
            "Id string, name string, SystemModstamp timestamp, IsDeleted boolean",
            [("c1", "alice2", T1, False)],
        )
        out = runner.sync_table("customer")
        assert out["rows"] == 2
        got = {r["Id"]: r for r in store.read("customer").collect()}
        assert got["c1"]["bal"] is None  # updated row nulls the dropped col
        assert got["c2"]["bal"] == 20.0  # untouched row keeps its value
        drift = store.manifest("customer").get("schema_drift")
        assert drift == {"removed": [{"column": "bal", "type": "double"}]}

    def test_retyped_column_fails_under_every_policy(self, env):
        spark, source, store, state, src_dir, _ = self._boot(env)
        _drift_source(
            spark,
            src_dir,
            "Id string, name string, bal string, SystemModstamp timestamp, IsDeleted boolean",
            [("c1", "alice2", "11.0", T1, False)],
        )
        for policy in ("strict", "widen", "allow-removed"):
            runner = SyncRunner(
                EntitySource(spark, str(src_dir)), store, state, drift_policy=policy
            )
            with pytest.raises(SchemaDriftError, match="retyped.*bal"):
                runner.sync_table("customer")
            assert state.get("customer").status == "ready"

    def test_strict_policy_rejects_additions_too(self, env):
        spark, source, store, state, src_dir, _ = self._boot(env)
        runner = SyncRunner(source, store, state, drift_policy="strict")
        _drift_source(
            spark,
            src_dir,
            "Id string, name string, bal double, tier string, SystemModstamp timestamp, IsDeleted boolean",
            [("c1", "alice2", 11.0, "gold", T1, False)],
        )
        with pytest.raises(SchemaDriftError, match="added.*tier"):
            runner.sync_table("customer")

    def test_invalid_policy_rejected_at_construction(self, env):
        spark, source, store, state, _ = env
        with pytest.raises(ValueError, match="drift_policy"):
            SyncRunner(source, store, state, drift_policy="yolo")

    def test_no_drift_cycle_has_no_ledger_entry(self, env):
        spark, source, store, state, src_dir, runner = self._boot(env)
        _drift_source(spark, src_dir, BASE_SCHEMA, [("c1", "alice2", 11.0, T1, False)])
        runner.sync_table("customer")
        assert "schema_drift" not in store.manifest("customer")


class TestPartitionedDriftRewrite:
    """Widening under the bucket-partitioned layout: write_partial would
    hardlink old-schema buckets into the new version (a mixed-schema
    publish), so a widened cycle pays one FULL rewrite that keeps the
    bucket layout."""

    def test_widened_partitioned_table_republishes_all_buckets(self, spark, tmp_path):
        src_dir = tmp_path / "src"
        src_dir.mkdir()
        rows = [(f"c{i}", f"n{i}", float(i), T0, False) for i in range(20)]
        spark.createDataFrame(rows, BASE_SCHEMA).write.parquet(
            str(src_dir / "customer.parquet")
        )
        source = EntitySource(spark, str(src_dir))
        store = TableStore(spark, str(tmp_path / "store"))
        state = SyncState(str(tmp_path / "sync.json"))
        runner = SyncRunner(source, store, state)
        runner.snapshot_load("customer", partition_buckets=4)
        state.release("customer", syncuntil=T0, touch_refresh=False)
        assert store.partition_info("customer")["partition_buckets"] == 4
        _drift_source(
            spark,
            src_dir,
            "Id string, name string, bal double, tier string, SystemModstamp timestamp, IsDeleted boolean",
            [("c1", "n1b", 1.5, "gold", T1, False)],
        )
        out = runner.sync_table("customer")
        assert out["rows"] == 20
        # layout preserved across the widening rewrite
        info = store.partition_info("customer")
        assert info["partition_buckets"] == 4
        df = store.read("customer")
        assert "tier" in df.columns
        # EVERY row readable with the new column (no mixed-schema buckets:
        # rows from unchanged buckets read as NULL, not as a read error)
        vals = {r["Id"]: r["tier"] for r in df.collect()}
        assert vals["c1"] == "gold"
        assert sum(1 for v in vals.values() if v is None) == 19
        drift = store.manifest("customer").get("schema_drift")
        assert drift == {"added": [{"column": "tier", "type": "string"}]}
        # the next NON-drift cycle goes back to the pruned write_partial path
        _drift_source(
            spark,
            src_dir,
            "Id string, name string, bal double, tier string, SystemModstamp timestamp, IsDeleted boolean",
            [("c2", "n2b", 2.5, "silver", T1 + timedelta(hours=1), False)],
        )
        runner.sync_table("customer")
        assert "rewritten_partitions" in store.manifest("customer")


class TestIsDeletedDrift:
    def test_dropping_isdeleted_is_loud_removal(self, spark, tmp_path):
        """A source that stops sending IsDeleted flips the merge to
        upsert-only -- deletes silently stop propagating. That is drift
        of the worst kind and must surface as a removal, not be absorbed
        as 'merge mode changed'."""
        src_dir = tmp_path / "src"
        src_dir.mkdir()
        spark.createDataFrame(
            [("c1", "alice", 10.0, T0, False)], BASE_SCHEMA
        ).write.parquet(str(src_dir / "customer.parquet"))
        source = EntitySource(spark, str(src_dir))
        store = TableStore(spark, str(tmp_path / "store"))
        state = SyncState(str(tmp_path / "sync.json"))
        runner = SyncRunner(source, store, state)
        runner.snapshot_load("customer")
        state.release("customer", syncuntil=T0, touch_refresh=False)
        _drift_source(
            spark,
            src_dir,
            "Id string, name string, bal double, SystemModstamp timestamp",
            [("c1", "alice2", 11.0, T1)],
        )
        with pytest.raises(SchemaDriftError, match="removed.*IsDeleted"):
            runner.sync_table("customer")


class TestWatermarkMonotonic:
    def test_delete_only_cycle_never_regresses_watermark(self, spark, tmp_path):
        """A cycle whose only changes are soft-deletes of the NEWEST rows:
        the deleted keys leave the target, so max(ts) of the merged table
        is LOWER than the current watermark. The release must keep the
        watermark monotonic (the JDBC leg's guard) -- a regressed value
        would re-open an ever-growing re-read window."""
        src_dir = tmp_path / "src"
        src_dir.mkdir()
        t2 = T1 + timedelta(hours=1)
        spark.createDataFrame(
            [("c1", "alice", 10.0, T0, False), ("c2", "bob", 20.0, T0, False)],
            BASE_SCHEMA,
        ).write.parquet(str(src_dir / "customer.parquet"))
        source = EntitySource(spark, str(src_dir))
        store = TableStore(spark, str(tmp_path / "store"))
        state = SyncState(str(tmp_path / "sync.json"))
        runner = SyncRunner(source, store, state)
        runner.snapshot_load("customer")
        state.release("customer", syncuntil=T0, touch_refresh=False)
        # cycle 1: c2 updated at t2 -- watermark advances to t2
        _drift_source(
            spark, src_dir, BASE_SCHEMA, [("c2", "bob2", 21.0, t2, False)]
        )
        runner.sync_table("customer")
        assert state.get("customer").syncuntil_dt() == t2
        # cycle 2: re-read window replays the t2 row as a SOFT DELETE
        # (strict > means nothing else qualifies after we rewind 1s)
        state.release("customer", syncuntil=T1, touch_refresh=False)
        _drift_source(
            spark, src_dir, BASE_SCHEMA, [("c2", "bob2", 21.0, t2, True)]
        )
        out = runner.sync_table("customer")
        # target now holds only c1 (ts=T0 < T1): an unguarded release
        # would REGRESS the watermark to T0
        assert state.get("customer").syncuntil_dt() == T1
        assert out["watermark"] == T1.isoformat()
        assert {r["Id"] for r in store.read("customer").collect()} == {"c1"}


class TestIsDeletedRetype:
    def test_isdeleted_retype_caught_by_merge_guard(self, spark):
        """IsDeleted is a helper for add/drop routing but NOT exempt from
        the type contract: a bool->string IsDeleted would pass a
        helper-exempting guard and die later inside the coalesce/~dead
        delete routing with an opaque AnalysisException."""
        target = spark.createDataFrame(
            [("c1", 10.0, T0, False)], "Id string, bal double, ts timestamp, IsDeleted boolean"
        )
        changes = spark.createDataFrame(
            [("c1", 11.0, T1, "false")], "Id string, bal double, ts timestamp, IsDeleted string"
        )
        with pytest.raises(SchemaDriftError, match="retyped.*IsDeleted"):
            merge_upsert(target, changes, pk="Id", ts_field="ts")


class TestClassifierAlgebraProperty:
    """VERDICT r11 ask #4: the classifier is load-bearing for merge
    safety (merge.py's retype guard delegates here), so its algebra is
    pinned structurally over RANDOM schema pairs, not just examples:
    classify(a,b) and classify(b,a) mirror added/removed, retype
    detection is symmetric, ignore columns are never classified, and the
    four buckets (added/removed/retyped/unchanged) exactly partition the
    visible name universe."""

    @staticmethod
    def _strategies():
        from hypothesis import strategies as st
        from pyspark.sql.types import (
            ArrayType,
            BooleanType,
            DecimalType,
            DoubleType,
            IntegerType,
            LongType,
            MapType,
            StringType,
            StructField,
            StructType,
            TimestampType,
        )

        # small name pool FORCES overlap (the interesting regime); the
        # type pool includes the parameterized shapes whose simpleString
        # must distinguish (decimal precisions, nested element types)
        names = st.sampled_from([f"c{i}" for i in range(8)])
        types = st.sampled_from(
            [
                IntegerType(),
                LongType(),
                DoubleType(),
                StringType(),
                BooleanType(),
                TimestampType(),
                DecimalType(10, 2),
                DecimalType(12, 2),
                ArrayType(LongType()),
                ArrayType(StringType()),
                MapType(StringType(), LongType()),
            ]
        )
        schemas = st.dictionaries(names, types, max_size=8).map(
            lambda d: StructType(
                [StructField(n, t) for n, t in sorted(d.items())]
            )
        )
        ignores = st.sets(names, max_size=3).map(frozenset)
        return schemas, ignores

    def test_classifier_algebra(self):
        from hypothesis import given, settings

        schemas, ignores = self._strategies()

        @settings(max_examples=300, deadline=None)
        @given(a=schemas, b=schemas, ignore=ignores)
        def check(a, b, ignore):
            fwd = classify_drift(a, b, ignore=ignore)
            rev = classify_drift(b, a, ignore=ignore)

            # mirror: what (a->b) calls added, (b->a) calls removed --
            # same (name, type) pairs, and vice versa
            assert set(fwd.added) == set(rev.removed)
            assert set(fwd.removed) == set(rev.added)
            # retype symmetry: same names, from/to swapped
            assert {(n, x, y) for n, x, y in fwd.retyped} == {
                (n, y, x) for n, x, y in rev.retyped
            }

            # ignore columns never surface in any bucket
            classified = (
                {n for n, _ in fwd.added}
                | {n for n, _ in fwd.removed}
                | {n for n, _, _ in fwd.retyped}
            )
            assert not classified & ignore

            # the buckets partition the visible universe: disjoint, and
            # together with unchanged cover every visible name
            ta = {f.name for f in a.fields} - ignore
            tb = {f.name for f in b.fields} - ignore
            add_n = {n for n, _ in fwd.added}
            rem_n = {n for n, _ in fwd.removed}
            ret_n = {n for n, _, _ in fwd.retyped}
            assert add_n == tb - ta
            assert rem_n == ta - tb
            assert ret_n <= ta & tb
            assert not (add_n & rem_n or add_n & ret_n or rem_n & ret_n)
            unchanged = (ta & tb) - ret_n
            assert add_n | rem_n | ret_n | unchanged == ta | tb

            # reflexivity: a schema never drifts against itself
            assert not classify_drift(a, a, ignore=ignore)
            # truthiness tracks content exactly
            assert bool(fwd) == bool(fwd.added or fwd.removed or fwd.retyped)
            # manifest entry carries a key iff the bucket is non-empty
            m = fwd.manifest_entry()
            assert set(m) == {
                k
                for k, v in (
                    ("added", fwd.added),
                    ("removed", fwd.removed),
                    ("retyped", fwd.retyped),
                )
                if v
            }

        check()

    def test_retyped_records_exact_simplestrings(self):
        from hypothesis import given, settings

        schemas, _ = self._strategies()

        @settings(max_examples=100, deadline=None)
        @given(a=schemas, b=schemas)
        def check(a, b):
            a_t = {f.name: f.dataType.simpleString() for f in a.fields}
            b_t = {f.name: f.dataType.simpleString() for f in b.fields}
            rep = classify_drift(a, b)
            for n, frm, to in rep.retyped:
                assert frm == a_t[n] and to == b_t[n] and frm != to
            # every shared name whose simpleString differs IS retyped
            assert {n for n, _, _ in rep.retyped} == {
                n for n in a_t.keys() & b_t.keys() if a_t[n] != b_t[n]
            }

        check()

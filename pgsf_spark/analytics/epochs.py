"""Epoch-consistent reader and recovery-to-steady-state gates (r20 batch).

VERDICT r13 asks #5/#6: the catalog story so far proves consistency via
per-table sums (``catalog_snapshot_gate``); these two gates extend it to
the shapes a fleet actually runs:

  - ``catalog_join_pin_gate`` -- the actual READER shape: a
    customer JOIN orders executed through ``CatalogStore.pin()``
    mid-wave. The pinned join sees the epoch-1 pair even while the
    store is mixed (cust already on epoch 2, ords not); the torn
    current-store join sees a value no single epoch ever produced --
    exactly the cross-table hazard the reference's per-table psycopg2
    transactions cannot prevent (sync:13-20). After the wave commits,
    a fresh pin reads the epoch-2 join. The oracle restates all three
    join aggregates from the base tables.
  - ``recovery_wave_gate`` -- the full disaster-recovery-to-steady-state
    composition: two tables sync a wave (one catalog commit), the sync
    ledger is DESTROYED, ``recover_state`` re-seeds BOTH tables from the
    manifest trail (sync/recovery.py), and one ``run_wave`` then syncs
    only the post-recovery window and commits ONE consistent catalog
    epoch. The oracle restates the final per-table sums, the recovered
    watermark, and the catalog version count from the base tables.

Scale notes: a pin is one tiny JSON resolve; the pinned join is the
same shuffle join Catalyst would plan against current pointers (the
catalog adds zero data bytes); recovery is O(tables x versions)
driver-side metadata -- nothing here scales with table bytes.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgsf_spark.tables import load_table

T0 = datetime(2024, 1, 1, 0, 0, 0)

J_E1 = 3  # epoch-1 value factor (both tables)
J_E2 = 7  # epoch-2 value factor

RW_SNAP = 3  # recovery_wave: snapshot value factor
RW_W1 = 7  # wave-1 value factor (pre-disaster)
RW_W2 = 11  # wave-2 value factor (post-recovery)
RW_HOUR_MOD = 5  # stamps = T0 + (pk % 5) hours
RW_TICK1_FROM_HOURS = 2  # wave 1 syncs from T0 + 2h (hours 3..4 qualify)
RW_W2_MOD = 10  # pk % 10 == 0 rows arrive after the disaster
RW_W2_HOURS = 6  # ... stamped T0 + 6h (after the recovered T0+4h)


def q_catalog_join_pin_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer JOIN orders through one pinned catalog epoch, mid-wave."""
    from pgsf_spark.operators.catalog import CatalogStore
    from pgsf_spark.operators.table_store import TableStore

    tmp = tempfile.mkdtemp(prefix="pgsf_joinpin_")
    try:
        store = TableStore(spark, os.path.join(tmp, "store"))
        catalog = CatalogStore(os.path.join(tmp, "catalog"))

        def _cust(factor: int) -> DataFrame:
            return (
                load_table(spark, sf_dir, "customer")
                .select(F.col("c_custkey").cast("long").alias("k"))
                .withColumn("v", (F.col("k") * factor).cast("long"))
            )

        def _ords(factor: int) -> DataFrame:
            return (
                load_table(spark, sf_dir, "orders")
                .select(
                    F.col("o_orderkey").cast("long").alias("o"),
                    F.col("o_custkey").cast("long").alias("ck"),
                )
                .withColumn("w", (F.col("o") * factor).cast("long"))
            )

        def _join_agg(cust: DataFrame, ords: DataFrame) -> tuple[int, int]:
            row = (
                ords.join(cust, ords["ck"] == cust["k"])
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum(F.col("v") + F.col("w")).cast("long").alias("s"),
                )
                .first()
            )
            return int(row["n"]), int(row["s"] or 0)

        # epoch 1 committed: both tables published, one catalog flip
        store.write(_cust(J_E1), "cust")
        store.write(_ords(J_E1), "ords")
        cat1 = catalog.snapshot_current(store, ["cust", "ords"])

        # the reader pins ONCE -- the epoch it will join against
        pin = catalog.pin()
        if pin != cat1:
            raise ValueError(f"pin must resolve the committed epoch: {pin}")

        # mid-wave: cust publishes epoch 2; the catalog does NOT flip
        store.write(_cust(J_E2), "cust")

        # the pinned join: both sides resolved through ONE catalog version
        n_matches, sum_pinned = _join_agg(
            catalog.read(store, "cust", pin), catalog.read(store, "ords", pin)
        )
        # the torn join a pointer-chasing reader would compute: epoch-2
        # cust against epoch-1 ords -- a pair NO epoch ever committed
        n_torn, sum_torn = _join_agg(store.read("cust"), store.read("ords"))
        if n_matches and n_torn != n_matches:
            raise ValueError("torn join changed the match count unexpectedly")
        if n_matches and sum_torn == sum_pinned:
            raise ValueError("torn join should differ from the pinned epoch")

        # the wave commits: ords publishes, ONE CAS'd catalog flip
        store.write(_ords(J_E2), "ords")
        cat2 = catalog.snapshot_current(store, ["cust", "ords"], expect_version=cat1)
        pin2 = catalog.pin()
        if pin2 != cat2:
            raise ValueError("fresh pin must resolve the new epoch")
        _, sum_committed = _join_agg(
            catalog.read(store, "cust", pin2), catalog.read(store, "ords", pin2)
        )

        # the ORIGINAL pin is immutable: the same join re-executed through
        # it AFTER the commit still returns the epoch-1 aggregate
        _, sum_pinned_again = _join_agg(
            catalog.read(store, "cust", pin), catalog.read(store, "ords", pin)
        )
        if sum_pinned_again != sum_pinned:
            raise ValueError("pinned join drifted after the wave committed")

        res = spark.createDataFrame(
            [
                (
                    n_matches,
                    sum_pinned,
                    sum_torn,
                    sum_committed,
                    len(catalog.versions()),
                )
            ],
            "n_matches bigint, sum_join_pinned bigint, sum_join_torn bigint, "
            "sum_join_committed bigint, n_catalog_versions int",
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_recovery_wave_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ledger loss -> manifest recovery -> one wave -> consistent epoch."""
    from pgsf_spark.operators.catalog import CatalogStore
    from pgsf_spark.operators.table_store import TableStore
    from pgsf_spark.sources.entity import EntitySource
    from pgsf_spark.sync.recovery import recover_state
    from pgsf_spark.sync.runner import SyncRunner
    from pgsf_spark.sync.state import SyncState
    from pgsf_spark.sync.wave import run_wave

    tmp = tempfile.mkdtemp(prefix="pgsf_recwave_")
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        tables = (("cust", "customer", "c_custkey"), ("ords", "orders", "o_orderkey"))
        pks = {n: pk for n, _, pk in tables}
        bases = {
            n: load_table(spark, sf_dir, b).select(F.col(pk).cast("long").alias(pk))
            for n, b, pk in tables
        }

        def _write_src(name: str, wave: int) -> None:
            pk = pks[name]
            base = bases[name]
            hour = (F.col(pk) % RW_HOUR_MOD).cast("int")
            v = (F.col(pk) * RW_SNAP).cast("long")
            stamp = F.lit(T0).cast("timestamp") + F.make_interval(hours=hour)
            if wave >= 1:
                v = (
                    F.when(hour > RW_TICK1_FROM_HOURS, F.col(pk) * RW_W1)
                    .otherwise(v)
                    .cast("long")
                )
            if wave >= 2:
                w2 = F.col(pk) % RW_W2_MOD == 0
                v = F.when(w2, F.col(pk) * RW_W2).otherwise(v).cast("long")
                stamp = F.when(
                    w2, F.lit(T0 + timedelta(hours=RW_W2_HOURS)).cast("timestamp")
                ).otherwise(stamp)
            (
                base.withColumn("v", v)
                .withColumn("SystemModstamp", stamp)
                .withColumn("IsDeleted", F.lit(False))
                .write.mode("overwrite")
                .parquet(os.path.join(src, f"{name}.parquet"))
            )

        for name, _, _ in tables:
            _write_src(name, wave=0)
        source = EntitySource(spark, src)
        store = TableStore(spark, os.path.join(tmp, "store"))
        state = SyncState(os.path.join(tmp, "sync.json"))
        runner = SyncRunner(source, store, state)
        catalog = CatalogStore(os.path.join(tmp, "catalog"))
        names = [n for n, _, _ in tables]
        for name, _, pk in tables:
            runner.snapshot_load(name, pk=pk, refresh_minutes=0)
            state.release(
                name,
                syncuntil=T0 + timedelta(hours=RW_TICK1_FROM_HOURS),
                touch_refresh=False,
            )
        n_base = bases["cust"].count()

        # wave 1 (pre-disaster): hours-3..4 rows carry RW_W1; the wave
        # commits the first catalog epoch
        for name, _, _ in tables:
            _write_src(name, wave=1)
        time.sleep(1.2)  # refresh_minutes=0 cadence has second granularity
        w1 = run_wave(runner, catalog, names, pks=pks)
        if n_base and (w1["failed"] or w1["held"] or w1["catalog_version"] is None):
            raise ValueError(f"wave 1 must tick both tables and commit: {w1}")

        # DISASTER: the ledger is gone; recovery re-seeds BOTH tables from
        # the manifest trail (fresh ledger -- no overwrite flag needed)
        os.unlink(os.path.join(tmp, "sync.json"))
        state2 = SyncState(os.path.join(tmp, "sync2.json"))
        recovered = recover_state(store, state2, names, refresh_minutes=0)
        max_stamp = T0 + timedelta(hours=RW_HOUR_MOD - 1)
        if n_base:
            for name in names:
                if recovered[name] != max_stamp.isoformat():
                    raise ValueError(
                        f"{name}: recovery must land on the merge manifest's "
                        f"post-tick watermark {max_stamp.isoformat()}, got "
                        f"{recovered[name]}"
                    )

        # steady state resumes: ONE wave syncs only the post-recovery
        # window (pk % 10 rows stamped T0+6h) and commits ONE epoch
        runner2 = SyncRunner(source, store, state2)
        for name, _, _ in tables:
            _write_src(name, wave=2)
        versions_before = {n: len(store.versions(n)) for n in names}
        w2 = run_wave(runner2, catalog, names, pks=pks)
        if n_base and (w2["failed"] or w2["held"] or w2["catalog_version"] is None):
            raise ValueError(f"post-recovery wave must tick and commit: {w2}")
        if n_base:
            for n in names:
                if len(store.versions(n)) != versions_before[n] + 1:
                    raise ValueError(
                        f"{n}: post-recovery tick must publish exactly one "
                        "version (no re-extract)"
                    )
            if len(catalog.versions()) != 2:
                raise ValueError(
                    f"exactly two epochs must exist: {catalog.versions()}"
                )

        # the reader: both tables through the final pinned epoch
        pin = catalog.pin() if catalog.current_version() else None

        def _sum(name: str) -> int:
            df = (
                catalog.read(store, name, pin)
                if pin is not None
                else store.read(name)
            )
            return int(df.agg(F.sum("v").cast("long").alias("s")).first()["s"] or 0)

        n_rows = int(
            (catalog.read(store, "cust", pin) if pin else store.read("cust")).count()
        )
        rec_hours = (
            int((datetime.fromisoformat(recovered["cust"]) - T0).total_seconds() // 3600)
            if n_base
            else 0
        )
        res = spark.createDataFrame(
            [
                (
                    n_rows,
                    _sum("cust"),
                    _sum("ords"),
                    rec_hours,
                    len(catalog.versions()),
                )
            ],
            "n_rows_cust bigint, sum_v_cust bigint, sum_v_ords bigint, "
            "recovered_wm_hours bigint, n_catalog_versions int",
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

"""Retention-pipeline gates: catalog-aware GC and maintenance-safe recovery.

Round-14 engine fixes made two retention hazards structurally
impossible; this r21 staged batch makes both driver-provable end-to-end:

  - ``catalog_retention_gate`` -- the catalog-GC-first retention
    pipeline. Three synced epochs pin three store versions; a
    catalog-aware store vacuum (``keep_versions =
    CatalogStore.referenced_versions``) deletes NOTHING even at
    ``keep=1``, because every store version is referenced by a published
    epoch -- the torn time-travel read vacuum alone would have caused
    (VERDICT r13 "What's wrong" #2) cannot happen. Catalog GC
    (``CatalogStore.vacuum``) then retires the oldest epoch, making
    exactly its store version collectable on the next store vacuum,
    while every RETAINED epoch still reads its full consistent state.
  - ``maintenance_recovery_gate`` -- the maintenance-then-disaster
    composition. Snapshot + one merge tick, then ``compact`` rewrites
    the layout and ``vacuum(keep=1)`` reduces the trail to ONLY that
    maintenance version; the sync ledger is DESTROYED. Because compact
    carries the watermark forward from the version it rewrites (VERDICT
    r13 "What's wrong" #1), ``recover_state`` still lands on the merge
    tick's post-tick position and the next tick syncs ONLY the
    post-recovery window -- no bulk re-load after routine 100 TB
    maintenance.

Scale notes: catalog GC unlinks tiny JSONs; the retention decision is
O(versions) driver-side metadata; compact is the same coalesce rewrite
the store always does. Nothing here scales with table bytes beyond the
one compaction rewrite the scenario exists to exercise.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgsf_spark.tables import load_table

T0 = datetime(2024, 1, 1, 0, 0, 0)

RET_EPOCHS = (2, 5, 9)  # value factor per published epoch
RET_CAT_KEEP = 2  # catalog GC retains the two newest epochs

MR_SNAP = 3  # maintenance_recovery: snapshot value factor
MR_W1 = 7  # merge-tick value factor (hours 3..4)
MR_W2 = 11  # post-recovery tick value factor
MR_HOUR_MOD = 5  # stamps = T0 + (pk % 5) hours
MR_TICK1_FROM_HOURS = 2  # tick 1 syncs from T0 + 2h
MR_W2_MOD = 10  # pk % 10 == 0 rows arrive after the disaster
MR_W2_HOURS = 6  # ... stamped T0 + 6h


def q_catalog_retention_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-GC-first retention: pinned epochs never lose their data."""
    from pgsf_spark.operators.catalog import CatalogStore
    from pgsf_spark.operators.table_store import TableStore

    tmp = tempfile.mkdtemp(prefix="pgsf_retention_")
    try:
        store = TableStore(spark, os.path.join(tmp, "store"))
        catalog = CatalogStore(os.path.join(tmp, "catalog"))
        base = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").cast("long").alias("k")
        )

        epochs: list[str] = []
        expect = None
        for factor in RET_EPOCHS:
            store.write(
                base.withColumn("v", (F.col("k") * factor).cast("long")), "cust"
            )
            expect = catalog.snapshot_current(store, ["cust"], expect_version=expect)
            epochs.append(expect)
        if len(store.versions("cust")) != len(RET_EPOCHS):
            raise ValueError("each epoch must publish one store version")

        # catalog-aware store vacuum: every version is referenced by a
        # published epoch, so even keep=1 deletes NOTHING
        v1 = store.vacuum(
            "cust", keep=1, keep_versions=catalog.referenced_versions("cust")
        )
        n_protected = len(store.versions("cust"))
        if v1:
            raise ValueError(f"catalog-referenced versions were deleted: {v1}")

        # catalog GC retires the oldest epoch; its store version becomes
        # collectable on the next catalog-aware store vacuum
        cat_victims = catalog.vacuum(keep=RET_CAT_KEEP)
        if len(cat_victims) != len(RET_EPOCHS) - RET_CAT_KEEP or cat_victims[0] != epochs[0]:
            raise ValueError(f"catalog GC must retire exactly the oldest: {cat_victims}")
        v2 = store.vacuum(
            "cust", keep=1, keep_versions=catalog.referenced_versions("cust")
        )
        if len(v2) != 1:
            raise ValueError(f"exactly the retired epoch's version collects: {v2}")

        # every RETAINED epoch still reads its full consistent state
        def _sum(cat_version: str) -> int:
            df = catalog.read(store, "cust", cat_version)
            return int(df.agg(F.sum("v").cast("long").alias("s")).first()["s"] or 0)

        sum_mid, sum_new = _sum(epochs[1]), _sum(epochs[2])
        # the retired epoch's mapping is gone -- a read through it is
        # LOUD (FileNotFoundError), never a silent wrong answer
        try:
            _sum(epochs[0])
            stale_is_loud = False
        except FileNotFoundError:
            stale_is_loud = True
        if not stale_is_loud:
            raise ValueError("retired epoch read must fail loudly")

        res = spark.createDataFrame(
            [
                (
                    sum_mid,
                    sum_new,
                    n_protected,
                    len(store.versions("cust")),
                    len(catalog.versions()),
                )
            ],
            "sum_epoch_mid bigint, sum_epoch_new bigint, n_store_protected int, "
            "n_store_after_gc int, n_catalog_after_gc int",
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_maintenance_recovery_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """compact -> vacuum -> ledger loss -> recovery continues incrementally."""
    from pgsf_spark.operators.table_store import TableStore
    from pgsf_spark.sources.entity import EntitySource
    from pgsf_spark.sync.recovery import recover_state
    from pgsf_spark.sync.runner import SyncRunner
    from pgsf_spark.sync.state import SyncState

    tmp = tempfile.mkdtemp(prefix="pgsf_maintrec_")
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        pk = "c_custkey"
        base = load_table(spark, sf_dir, "customer").select(
            F.col(pk).cast("long").alias(pk)
        )
        hour = (F.col(pk) % MR_HOUR_MOD).cast("int")

        def _write_src(wave: int) -> None:
            v = (F.col(pk) * MR_SNAP).cast("long")
            stamp = F.lit(T0).cast("timestamp") + F.make_interval(hours=hour)
            if wave >= 1:
                v = (
                    F.when(hour > MR_TICK1_FROM_HOURS, F.col(pk) * MR_W1)
                    .otherwise(v)
                    .cast("long")
                )
            if wave >= 2:
                w2 = F.col(pk) % MR_W2_MOD == 0
                v = F.when(w2, F.col(pk) * MR_W2).otherwise(v).cast("long")
                stamp = F.when(
                    w2, F.lit(T0 + timedelta(hours=MR_W2_HOURS)).cast("timestamp")
                ).otherwise(stamp)
            (
                base.withColumn("v", v)
                .withColumn("SystemModstamp", stamp)
                .withColumn("IsDeleted", F.lit(False))
                .write.mode("overwrite")
                .parquet(os.path.join(src, "cust.parquet"))
            )

        _write_src(wave=0)
        source = EntitySource(spark, src)
        store = TableStore(spark, os.path.join(tmp, "store"))
        state = SyncState(os.path.join(tmp, "sync.json"))
        runner = SyncRunner(source, store, state)
        n_base = runner.snapshot_load("cust", pk=pk, refresh_minutes=0)

        # one merge tick from T0+2h (hours 3..4 carry MR_W1)
        state.release(
            "cust",
            syncuntil=T0 + timedelta(hours=MR_TICK1_FROM_HOURS),
            touch_refresh=False,
        )
        _write_src(wave=1)
        runner.sync_table("cust", pk=pk)

        # ROUTINE MAINTENANCE: compact, then vacuum down to ONLY the
        # compacted version -- the manifest trail is all-maintenance now
        store.compact("cust", target_partitions=1)
        store.vacuum("cust", keep=1)
        if len(store.versions("cust")) != 1:
            raise ValueError("vacuum must reduce the trail to the compacted version")
        if not store.manifest("cust").get("compacted"):
            raise ValueError("the surviving version must be the maintenance rewrite")

        # DISASTER: the ledger is gone; recovery must land on the merge
        # tick's position CARRIED THROUGH the compact manifest
        os.unlink(os.path.join(tmp, "sync.json"))
        state2 = SyncState(os.path.join(tmp, "sync2.json"))
        recovered = recover_state(store, state2, ["cust"], refresh_minutes=0)
        max_stamp = T0 + timedelta(hours=MR_HOUR_MOD - 1)
        if n_base and recovered["cust"] != max_stamp.isoformat():
            raise ValueError(
                f"recovery must land on the carried watermark "
                f"{max_stamp.isoformat()}, got {recovered}"
            )

        # steady state: the next tick syncs ONLY the post-recovery window
        runner2 = SyncRunner(source, store, state2)
        _write_src(wave=2)
        n_window = source.incremental("cust", "SystemModstamp", max_stamp).count()
        runner2.sync_table("cust", pk=pk)

        agg = (
            store.read("cust")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("v").cast("long").alias("s"),
            )
            .first()
        )
        if n_base and agg["n"] != n_base:
            raise ValueError(f"maintenance+recovery changed the row count: {agg['n']}")
        rec_hours = (
            int(
                (datetime.fromisoformat(recovered["cust"]) - T0).total_seconds() // 3600
            )
            if n_base
            else 0
        )
        res = spark.createDataFrame(
            [
                (
                    agg["n"],
                    agg["s"],
                    int(n_window),
                    rec_hours,
                    len(store.versions("cust")),
                )
            ],
            "n_rows bigint, sum_v bigint, n_window bigint, "
            "recovered_wm_hours bigint, n_versions int",
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

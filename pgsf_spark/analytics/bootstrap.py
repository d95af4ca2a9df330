"""First-load bootstrap + reverse-ETL result parsing, driver-provable.

The two surfaces the round-12 verdict asked to gate (asks #4 and #5) --
each had pytest-only proof; these faces make the semantics a
CORRECTNESS row:

  - ``bootstrap_seed_gate`` (C6) -- the first-load watermark seed.
    The reference seeds the watermark from the EXTRACT's own timestamp,
    not from max(ts) of the landed data (csv_to_postgres.py:94 inserts
    the bulk job's systemModstamp; synctable.py:83-106): anything
    modified WHILE the extract ran is re-read by the first incremental
    poll and absorbed by the idempotent PK merge. The gate runs the real
    ``SyncRunner.snapshot_load`` and pins, in one hash: (a) the seed is
    the extract-start wall-clock (asserted between before/after clock
    captures, never max(ts)); (b) the boundary rows -- stamps strictly
    inside (extract_start, max(ts)] -- ARE re-fetched by the first tick
    and their mid-extract updates land in the replica; (c) rows stamped
    EXACTLY at extract-start are NOT re-read (P4's strict ``>``,
    query_poll_table.py:76-83) -- their post-snapshot source poison
    value must never appear; (d) re-running the same tick from the same
    watermark is idempotent (identical replica aggregates).
  - ``upload_results_gate`` (K4b) -- reverse-ETL per-record outcomes.
    ``upload_dataframe_with_results`` posts capped CSV chunks and parses
    the service's per-record result rows (Id/Success/Created/Error ==
    salesforce_bulk.py:498-546 UploadResult), keeping outcomes
    DISTRIBUTED (mapPartitions, no driver collect). The fake service is
    deterministic on Id arithmetic (``Id % 7 == 0`` rejected as
    DUPLICATE_VALUE, like the reference's error-routing examples) and
    appends one summary row per BATCH so chunk accounting rides the
    same result frame: the oracle restates record totals, success/error
    routing, id sums, and the chunk count (ceil division at the record
    cap) from ``customer`` alone.

Scale notes: the bootstrap fixture runs the real partition-pruned merge
(hive-bucketed replica, only changed buckets rewritten); the upload gate
feeds one partition deliberately so the chunk count is oracle-restatable
-- the operator itself is per-partition streaming with bounded chunk
buffers, the shape that holds at 100 TB fan-out.
"""

from __future__ import annotations

import csv
import io
import math
import os
import shutil
import tempfile
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pgsf_spark.tables import load_table

T0 = datetime(2024, 1, 1, 0, 0, 0)

BOOT_HOUR_MOD = 5  # SystemModstamp = T0 + (pk % 5) hours
BOOT_EXTRACT_HOURS = 2  # extract started at T0 + 2h (the seed we rewind to)
V_OLD = 3  # value in the snapshot the extract saw
V_NEW = 7  # mid-extract update (stamps in hours 3..4 -- re-read by tick 1)
V_POISON = 11  # post-snapshot write at EXACTLY extract-start (must NOT land)
BOOT_BUCKETS = 4

UPLOAD_FAIL_MOD = 7  # Id % 7 == 0 records are rejected by the fake service
UPLOAD_MAX_RECORDS = 100  # record cap per chunk (10k in prod; small to multi-chunk)
UPLOAD_SUMMARY_ID = "batch-summary"


def q_bootstrap_seed_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 end-to-end: extract-start seed -> boundary re-fetch -> idempotent merge."""
    from pgsf_spark.operators.table_store import TableStore
    from pgsf_spark.sources.entity import EntitySource
    from pgsf_spark.sync.runner import SyncRunner
    from pgsf_spark.sync.state import SyncState, _utcnow

    tmp = tempfile.mkdtemp(prefix="pgsf_bootstrap_")
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        pk = "c_custkey"
        base = load_table(spark, sf_dir, "customer").select(
            F.col(pk).cast("long").alias(pk)
        )
        stamp = F.lit(T0).cast("timestamp") + F.make_interval(
            hours=(F.col(pk) % BOOT_HOUR_MOD).cast("int")
        )

        def _src_df(value_col):
            return (
                base.withColumn("v", value_col.cast("long"))
                .withColumn("SystemModstamp", stamp)
                .withColumn("IsDeleted", F.lit(False))
            )

        # the snapshot the extract saw: every row at its V_OLD value
        _src_df(F.col(pk) * V_OLD).write.parquet(os.path.join(src, "cust.parquet"))

        source = EntitySource(spark, src)
        store = TableStore(spark, os.path.join(tmp, "store"))
        state = SyncState(os.path.join(tmp, "sync.json"))
        runner = SyncRunner(source, store, state)

        t_before = _utcnow().replace(microsecond=0)  # seed is second-grain
        n_base = runner.snapshot_load(
            "cust", pk=pk, refresh_minutes=0, partition_buckets=BOOT_BUCKETS
        )
        t_after = _utcnow()
        seeded = state.get("cust").syncuntil_dt()
        max_stamp = T0 + timedelta(hours=BOOT_HOUR_MOD - 1)
        if not (t_before <= seeded <= t_after):
            raise ValueError(
                f"C6 seed must be extract-start wall-clock: {seeded} not in "
                f"[{t_before}, {t_after}]"
            )
        if seeded == max_stamp:
            raise ValueError("C6 seed must not be max(ts) of the landed data")

        # mid-extract source churn, stamps unchanged: boundary rows
        # (hours 3..4, strictly after extract-start) updated to V_NEW;
        # the hour-2 rows (EXACTLY extract-start) poisoned -- P4's strict
        # ``>`` means tick 1 must never read them
        hour = F.col(pk) % BOOT_HOUR_MOD
        churned = (
            F.when(hour > BOOT_EXTRACT_HOURS, F.col(pk) * V_NEW)
            .when(hour == BOOT_EXTRACT_HOURS, F.col(pk) * V_POISON)
            .otherwise(F.col(pk) * V_OLD)
        )
        _src_df(churned).write.mode("overwrite").parquet(
            os.path.join(src, "cust.parquet")
        )

        # rewind the seed to the extract-START the fixture simulates
        # (the real seed above is wall-clock NOW, after every fixture
        # stamp; the rewind puts the boundary window inside the data)
        t_extract = T0 + timedelta(hours=BOOT_EXTRACT_HOURS)
        state.release("cust", syncuntil=t_extract, touch_refresh=False)
        n_refetched = source.incremental("cust", "SystemModstamp", t_extract).count()

        r1 = runner.sync_table("cust", pk=pk)
        agg_cols = [
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("s"),
        ]
        agg1 = store.read("cust").agg(*agg_cols).first()
        if n_base:
            if r1["watermark"] != max_stamp.isoformat():
                raise ValueError(
                    f"tick 1 must advance the watermark to max(ts): {r1}"
                )
            if not n_refetched:
                raise ValueError("boundary window re-fetched nothing")
            # idempotency: the SAME boundary batch applied twice from the
            # same watermark leaves the replica byte-identical
            state.release("cust", syncuntil=t_extract, touch_refresh=False)
            r2 = runner.sync_table("cust", pk=pk)
            agg2 = store.read("cust").agg(*agg_cols).first()
            if (agg2["n"], agg2["s"]) != (agg1["n"], agg1["s"]):
                raise ValueError(
                    f"re-applying the boundary batch changed the replica: "
                    f"{tuple(agg1)} -> {tuple(agg2)}"
                )
            if r2["watermark"] != max_stamp.isoformat():
                raise ValueError(f"tick 2 watermark regressed: {r2}")

        final_wm = state.get("cust").syncuntil_dt()
        wm_hours = int((final_wm - T0).total_seconds() // 3600) if n_base else 0
        res = spark.createDataFrame(
            [(agg1["n"], agg1["s"], int(n_refetched), wm_hours)],
            "n_rows bigint, sum_v bigint, n_refetched bigint, wm_advance_hours bigint",
        )
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _fake_bulk_service(chunk_csv: str) -> str:
    """Deterministic bulk-API result endpoint (executor-side, picklable).

    Answers one uploaded chunk with the service's result CSV
    (Id,Success,Created,Error -- salesforce_bulk.py:498-546): records
    whose Id % UPLOAD_FAIL_MOD == 0 are rejected as DUPLICATE_VALUE with
    an empty id (failed inserts have none), everything else succeeds
    created=true with the service-assigned id echoing the record key.
    Enforces the chunk caps loudly (a chunk over the record cap fails
    the job, not silently). Appends ONE summary row per batch
    (id=batch-summary, created=false, error=RECORDS:<n>) so chunk
    accounting rides the same distributed result frame the per-record
    outcomes do."""
    rows = list(csv.reader(io.StringIO(chunk_csv)))
    header, recs = rows[0], [r for r in rows[1:] if r]
    if len(recs) > UPLOAD_MAX_RECORDS:
        raise ValueError(f"chunk exceeds the record cap: {len(recs)}")
    id_idx = header.index("Id")
    out = io.StringIO()
    w = csv.writer(out, lineterminator="\n")
    w.writerow(["Id", "Success", "Created", "Error"])
    for rec in recs:
        rid = int(rec[id_idx])
        if rid % UPLOAD_FAIL_MOD == 0:
            w.writerow(
                ["", "false", "false", f"DUPLICATE_VALUE:Id {rid} already exists"]
            )
        else:
            w.writerow([str(rid), "true", "true", ""])
    w.writerow([UPLOAD_SUMMARY_ID, "true", "false", f"RECORDS:{len(recs)}"])
    return out.getvalue()


def q_upload_results_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4b end-to-end: chunked upload -> per-record outcomes -> routing."""
    from pgsf_spark.operators.upload import upload_dataframe_with_results

    pk = "c_custkey"
    src = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.col(pk).cast("long").alias("Id"),
            F.col("c_name").alias("Name"),
        )
        # one partition ON PURPOSE: chunking is per-partition, so this
        # makes the chunk count exactly ceil(n / cap) -- the property the
        # oracle restates. The operator itself is per-partition streaming
        # (prod runs it on the source's own partitioning).
        .repartition(1)
    )
    res = upload_dataframe_with_results(
        src, _fake_bulk_service, max_records=UPLOAD_MAX_RECORDS
    )
    err = F.coalesce(F.col("error"), F.lit(""))
    # rejected records carry a NULL id -- coalesce so the summary
    # predicate stays three-valued-logic-safe for them
    is_summary = F.coalesce(F.col("id"), F.lit("")) == UPLOAD_SUMMARY_ID
    one = F.lit(1)
    agg = res.agg(
        F.sum(F.when(~is_summary, one).otherwise(0)).cast("long").alias("n_records"),
        F.sum(F.when(is_summary, one).otherwise(0)).cast("long").alias("n_chunks"),
        F.sum(
            F.when(is_summary, F.split(err, ":").getItem(1).cast("long")).otherwise(0)
        )
        .cast("long")
        .alias("chunk_records_total"),
        F.sum(F.when(~is_summary & F.col("success") & F.col("created"), one).otherwise(0))
        .cast("long")
        .alias("n_success"),
        F.sum(F.when(err.startswith("DUPLICATE_VALUE"), one).otherwise(0))
        .cast("long")
        .alias("n_failed_dup"),
        F.sum(
            F.when(
                ~is_summary & F.col("success"), F.col("id").cast("long")
            ).otherwise(0)
        )
        .cast("long")
        .alias("sum_ok_ids"),
        F.sum(
            F.when(~F.col("success") & (F.length("id") > 0), one).otherwise(0)
        )
        .cast("long")
        .alias("n_failed_with_id"),
    ).first()
    if agg["n_records"]:
        if agg["chunk_records_total"] != agg["n_records"]:
            raise ValueError(
                f"chunk summaries lost records: {agg['chunk_records_total']} "
                f"!= {agg['n_records']}"
            )
        if agg["n_chunks"] != math.ceil(agg["n_records"] / UPLOAD_MAX_RECORDS):
            raise ValueError(f"chunk count broke the cap math: {dict(agg.asDict())}")
        if agg["n_failed_with_id"]:
            raise ValueError("rejected records must carry no service id")
    res_row = spark.createDataFrame(
        [
            (
                agg["n_records"] or 0,
                agg["n_chunks"] or 0,
                agg["n_success"] or 0,
                agg["n_failed_dup"] or 0,
                agg["sum_ok_ids"] or 0,
            )
        ],
        "n_records bigint, n_chunks bigint, n_success bigint, "
        "n_failed_dup bigint, sum_ok_ids bigint",
    )
    return res_row.localCheckpoint(eager=True)

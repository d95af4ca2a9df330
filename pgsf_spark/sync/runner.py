"""Sync runner: snapshot load + incremental sync + scheduler loop.

Reference flow parity:
  - snapshot load (§3.1): query_bulk -> download -> createtable ->
    csv_to_postgres -> seed __sync  ==> one Spark job: scan -> overwrite
    write -> seed watermark from extract-start time (C6).
  - incremental sync (§3.2): query_poll_table.sync_table ==> claim ->
    incremental scan (P4) -> latest-per-key dedup -> merge upsert (K3) ->
    atomic publish -> advance watermark to max(ts) of merged table (A1) ->
    release. Exactly-once effect (C3) comes from atomic publish + the
    idempotent-by-key merge.
  - scheduler (C2): the `sync` cron script's due-table fan-out; here a
    thread pool over due tables (per-table concurrency like the reference's
    one-process-per-table `&` loop, sync:14-20).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from datetime import datetime, timezone

from pyspark.sql import functions as F

from pgsf_spark.operators.jdbc_sink import JdbcPostgresSink
from pgsf_spark.operators.merge import merge_upsert
from pgsf_spark.operators.table_store import PGSF_BUCKET, TableStore
from pgsf_spark.sources.entity import EntitySource
from pgsf_spark.sync.state import READY, ClaimError, SyncState

DEFAULT_PARTITION_BUCKETS = 16


def _utcnow() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


def sync_job_group(table: str) -> str:
    """Job-group id tagging all Spark jobs of one table's sync; abort cancels
    the group (parity with abort_refresh.py:49-68, which kills the refresh
    process -- here the running Spark jobs are the process)."""
    return f"pgsf-sync-{table}"


def pk_bucket(pk: str, n_buckets: int):
    """Deterministic pk-hash partition value. Hash of the STRING form so the
    bucket survives pk type changes; xxhash64 is stable across Spark versions
    and task retries."""
    return F.pmod(F.xxhash64(F.col(pk).cast("string")), F.lit(n_buckets)).cast("int")


class SyncRunner:
    """``maintenance_every``: run compaction + GC on a table after every N
    successful merges (the reference runs its 7-day job GC from cron,
    delete_old_jobs_data.sh; here maintenance piggybacks on the sync loop
    so small merge files and dead versions never accumulate unboundedly).
    ``vacuum_keep``/``vacuum_ttl_seconds`` are passed to TableStore.vacuum."""

    def __init__(
        self,
        source: EntitySource,
        store: TableStore,
        state: SyncState,
        maintenance_every: int | None = None,
        vacuum_keep: int = 2,
        vacuum_ttl_seconds: float | None = None,
        drift_policy: str = "widen",
    ):
        if drift_policy not in ("strict", "widen", "allow-removed"):
            raise ValueError(
                f"drift_policy must be strict|widen|allow-removed, got {drift_policy!r}"
            )
        self.source = source
        self.store = store
        self.state = state
        self.maintenance_every = maintenance_every
        self.vacuum_keep = vacuum_keep
        self.vacuum_ttl_seconds = vacuum_ttl_seconds
        self.drift_policy = drift_policy
        self._merges_since_maintenance: dict[str, int] = {}

    def _classify_drift(self, table: str, changes):
        """Schema-drift routing (the reference's open TODO,
        query_poll_table.py:202): classify the batch schema against the
        replica's BEFORE the merge touches data, and route per
        ``drift_policy``:

          - retyped columns: ALWAYS a loud failure (never auto-merged);
          - removed columns: loud failure under strict/widen (silent
            nulling on every later update is quiet rot), permitted and
            LEDGERED under allow-removed;
          - added columns: loud failure under strict, widened and
            LEDGERED otherwise.

        Returns the manifest audit entry ({} when no drift), so every
        absorbed drift is visible in the published version's ledger."""
        from pgsf_spark.operators.merge import SchemaDriftError
        from pgsf_spark.schema.drift import classify_drift

        # IsDeleted is NOT ignored: a source that stops sending it flips
        # the merge to upsert-only (deletes silently stop propagating) --
        # that is drift of the worst kind, and surfaces here as a removal
        drift = classify_drift(
            self.store.read(table).schema,
            changes.schema,
            ignore={PGSF_BUCKET, "_file_order"},
        )
        if not drift:
            return {}
        hard = bool(drift.retyped)
        hard = hard or (self.drift_policy == "strict")
        hard = hard or (drift.removed and self.drift_policy != "allow-removed")
        if hard:
            raise SchemaDriftError(
                f"{table}: schema drift ({drift.describe()}) under "
                f"drift_policy={self.drift_policy!r} -- resolve the source "
                f"contract (schema/mapping.py) or re-snapshot; the failed "
                f"cycle advanced nothing"
            )
        return {"schema_drift": drift.manifest_entry()}

    def maintenance(self, table: str) -> dict:
        """Compact the current version and GC old ones; returns a summary.
        A JDBC target handles its own storage maintenance (PG autovacuum)."""
        if isinstance(self.store, JdbcPostgresSink):
            return {"table": table, "compacted": False, "vacuumed": []}
        self.store.compact(table)
        victims = self.store.vacuum(
            table, keep=self.vacuum_keep, ttl_seconds=self.vacuum_ttl_seconds
        )
        return {"table": table, "compacted": True, "vacuumed": victims}

    def _maybe_maintain(self, table: str) -> bool:
        if not self.maintenance_every:
            return False
        n = self._merges_since_maintenance.get(table, 0) + 1
        if n < self.maintenance_every:
            self._merges_since_maintenance[table] = n
            return False
        self._merges_since_maintenance[table] = 0
        self.maintenance(table)
        return True

    def snapshot_load(
        self,
        table: str,
        fields: list[str] | None = None,
        pk: str = "Id",
        ts_field: str = "SystemModstamp",
        refresh_minutes: int = 10,
        buckets: int | None = None,
        partition_buckets: int | None = DEFAULT_PARTITION_BUCKETS,
    ) -> int:
        """Full refresh: extract snapshot -> overwrite target -> seed watermark.

        Watermark seeds from extract-START time, not max(ts): anything
        modified during the extract is re-read by the first poll -- safe and
        faithful to the reference (csv_to_postgres.py:94 uses the job's
        systemModstamp, i.e. job creation time).

        The replica is hive-partitioned by a pk-hash bucket (default): each
        incremental merge then rewrites only the partitions containing
        changed keys (sync_table + TableStore.write_partial) instead of the
        whole table -- the reference's touch-only-changed-rows economics
        (query_poll_table.py:107-152). ``partition_buckets=None`` keeps the
        flat layout.
        """
        started = _utcnow()
        sc = self.source.spark.sparkContext
        sc.setJobGroup(sync_job_group(table), f"pgsf snapshot load: {table}", interruptOnCancel=True)
        df = self.source.load(table, fields=fields, include_deleted=True)
        if isinstance(self.store, JdbcPostgresSink):
            # Live-PG target: CREATE (createtable.py flow) happens via
            # full_load(create=True) explicitly, not implicitly here --
            # snapshot semantics are TRUNCATE + parallel append.
            self.store.full_load(df, table, pk=pk)
            n = df.count()
            self.state.insert(table, syncuntil=started, refresh_minutes=refresh_minutes)
            return n
        manifest: dict = {"op": "snapshot", "extract_started": started.isoformat()}
        partition_by = None
        if partition_buckets:
            df = df.withColumn(PGSF_BUCKET, pk_bucket(pk, partition_buckets))
            partition_by = [PGSF_BUCKET]
            manifest["partition_buckets"] = partition_buckets
        self.store.write(
            df,
            table,
            buckets=buckets,
            bucket_col=pk if buckets else None,
            partition_by=partition_by,
            manifest=manifest,
        )
        n = self.store.read(table).count()
        self.state.insert(table, syncuntil=started, refresh_minutes=refresh_minutes)
        return n

    def _finish_sync(self, table: str, ts_field: str, wm) -> dict:
        """Post-publish tail of a sync cycle: advance the watermark to
        max(ts) of the *target* after merge (synctable.py:45-54), run
        piggybacked maintenance, release the claim.

        MONOTONIC guard (same as the JDBC leg): a cycle whose changes are
        only soft-deletes of the NEWEST rows removes them from the target,
        so max(ts) of the merged table can be LOWER than the current
        watermark -- releasing that regressed value would re-read the same
        tombstone window forever. The watermark never moves backward."""
        new_df = self.store.read(table)
        max_ts = new_df.agg(F.max(ts_field).alias("m")).first()["m"]
        n = new_df.count()
        maintained = self._maybe_maintain(table)
        new_wm = max_ts if (max_ts is not None and max_ts > wm) else wm
        self.state.release(table, READY, syncuntil=new_wm)
        out = {"table": table, "rows": n, "watermark": new_wm.isoformat()}
        if maintained:
            out["maintenance"] = True
        return out

    def sync_table(self, table: str, pk: str = "Id", ts_field: str = "SystemModstamp") -> dict:
        """One incremental sync cycle for one table (query_poll_table.py:155-204)."""
        row = self.state.claim(table)  # guarded ready->running
        # Tag every Spark job of this sync so Engine.abort can cancel the
        # actual running work, not just flip the status row. Thread-local:
        # run_due's pool threads tag their own table's jobs independently.
        self.source.spark.sparkContext.setJobGroup(
            sync_job_group(table), f"pgsf incremental sync: {table}", interruptOnCancel=True
        )
        try:
            wm = row.syncuntil_dt()
            if wm is None:
                raise ClaimError(f"{table}: no watermark -- bulk-load first (query_poll_table.py:69-73)")
            changes = self.source.incremental(table, ts_field, wm)
            if isinstance(self.store, JdbcPostgresSink):
                # Route through the reference's staged-merge transaction
                # (query_poll_table.py:107-152): dedup Spark-side, COPY into
                # tmp_T over JDBC, upsert+delete server-side. Watermark
                # advances to max(ts) of the applied batch (the target's
                # post-merge max, synctable.py:45-54, equals it when rows
                # were applied; unchanged wm otherwise).
                changes = changes.localCheckpoint()
                n = changes.count()
                self.store.staged_merge(changes, table, pk=pk, ts_field=ts_field)
                mx = changes.agg(F.max(ts_field).alias("m")).first()["m"]
                new_wm = mx if mx is not None and mx > wm else wm
                maintained = self._maybe_maintain(table)
                self.state.release(table, READY, syncuntil=new_wm)
                out = {"table": table, "rows": n, "watermark": new_wm.isoformat()}
                if maintained:
                    out["maintenance"] = True
                return out
            # Classify schema drift against the replica BEFORE the merge:
            # a hard-drift cycle fails here, releases the claim in the
            # except path below, and advances nothing -- vs the
            # reference's opaque crash-and-retry-forever (its TODO).
            # The JDBC leg is excluded above (PG owns its schema there).
            drift_audit = self._classify_drift(table, changes)

            # Post-tick sync position for the version manifest: max(ts of
            # the change batch), clamped monotonic. Every row with ts <=
            # this value is processed by this tick (the window was strictly
            # > wm), so a ledger recovered from the manifest
            # (sync/recovery.py) continues incrementally without re-reading
            # the applied window. Called per publish site so the
            # partitioned path computes it from the PINNED
            # (localCheckpoint'ed) batch -- the same evaluation the written
            # rows come from. The plain "watermark" field stays the window
            # START for lineage.
            def _wm_after(batch):
                mx = batch.agg(F.max(ts_field).alias("m")).first()["m"]
                return mx if (mx is not None and mx > wm) else wm

            info = self.store.partition_info(table)
            if info and info.get("partition_buckets") and info["partition_by"] == [PGSF_BUCKET]:
                # Partition-pruned merge: only buckets containing changed
                # keys are read (directory pruning on the partition filter)
                # and rewritten; everything else is hardlink-carried by
                # write_partial. Cost per tick: O(changes + changed buckets).
                nb = info["partition_buckets"]
                # Materialize the change batch ONCE before deriving buckets:
                # the bucket list and the written rows must come from the
                # same evaluation -- a source whose re-evaluation can yield
                # new rows (any live CDC source) would otherwise write rows
                # into bucket dirs absent from changed_buckets, and
                # write_partial would hardlink the old files into those same
                # dirs (duplicate keys). localCheckpoint pins the batch
                # (small: one tick's changes) executor-side.
                changes = changes.withColumn(PGSF_BUCKET, pk_bucket(pk, nb)).localCheckpoint()
                if drift_audit:
                    # A widened schema cannot ride write_partial: untouched
                    # buckets are carried by HARDLINK, so the published
                    # version would mix old-schema and new-schema parquet
                    # under one manifest. Widening is rare; pay ONE full
                    # rewrite that republishes every bucket under the new
                    # schema, preserving the bucket layout.
                    target = self.store.read(table, keep_internal=True)
                    merged = merge_upsert(
                        target, changes, pk=pk, ts_field=ts_field, order_col="_file_order"
                    )
                    self.store.write(
                        merged,
                        table,
                        partition_by=[PGSF_BUCKET],
                        manifest={
                            "op": "merge",
                            "watermark": wm.isoformat(),
                            "watermark_after": _wm_after(changes).isoformat(),
                            "partition_buckets": nb,
                            **drift_audit,
                        },
                    )
                    return self._finish_sync(table, ts_field, wm)
                changed_buckets = [
                    r[0] for r in changes.select(PGSF_BUCKET).distinct().collect()
                ]
                if changed_buckets:
                    target = self.store.read(table, keep_internal=True).filter(
                        F.col(PGSF_BUCKET).isin(changed_buckets)
                    )
                    merged = merge_upsert(
                        target, changes, pk=pk, ts_field=ts_field, order_col="_file_order"
                    )
                else:
                    # empty batch: publish a hardlink-only version (every
                    # tick publishes, like the reference's per-tick
                    # transaction; zero partitions rewritten)
                    merged = self.store.read(table, keep_internal=True).limit(0)
                self.store.write_partial(
                    merged,
                    table,
                    PGSF_BUCKET,
                    changed_buckets,
                    manifest={
                        "op": "merge",
                        "watermark": wm.isoformat(),
                        "watermark_after": _wm_after(changes).isoformat(),
                        **drift_audit,
                    },
                )
            else:
                # Pin the batch for the same reason the partitioned path
                # does: the manifest's watermark_after agg and the merge
                # write must see the SAME evaluation of a live source, or
                # the recovered ledger could claim rows the published
                # version never received (permanent skip under strict >).
                changes = changes.localCheckpoint()
                target = self.store.read(table)
                merged = merge_upsert(target, changes, pk=pk, ts_field=ts_field, order_col="_file_order")
                self.store.write(
                    merged,
                    table,
                    manifest={
                        "op": "merge",
                        "watermark": wm.isoformat(),
                        "watermark_after": _wm_after(changes).isoformat(),
                        **drift_audit,
                    },
                )
            return self._finish_sync(table, ts_field, wm)
        except ClaimError:
            raise
        except Exception:
            # On failure: back to ready without advancing the watermark
            # (query_poll_table.py:199-204); the next cycle retries.
            self.state.release(table, READY, touch_refresh=False)
            raise

    def run_due(self, max_workers: int = 8, pks: dict[str, str] | None = None, ts_fields: dict[str, str] | None = None) -> list[dict]:
        """One scheduler tick: claim+sync every due table concurrently.

        Per-table failure isolation (ADVICE r1): one table's exception is
        recorded in its result row and never aborts the tick -- the reference
        runs one process per table (sync:14-20), so failures are independent
        there too. sync_table itself already released the claim on error."""
        due = self.state.due_tables()
        results: list[dict] = []
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            futs = {
                ex.submit(
                    self.sync_table,
                    t,
                    (pks or {}).get(t, "Id"),
                    (ts_fields or {}).get(t, "SystemModstamp"),
                ): t
                for t in due
            }
            for fut, t in futs.items():
                try:
                    results.append(fut.result())
                except ClaimError:
                    pass  # raced by another runner -- fine, it's the lock working
                except Exception as e:  # noqa: BLE001 -- isolate per-table failures
                    results.append({"table": t, "error": f"{type(e).__name__}: {e}"})
        return results

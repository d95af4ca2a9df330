"""Sync-state disaster recovery: rebuild watermarks from store manifests.

The reference keeps its watermark ledger in the target database's
``__sync`` table (synctable.py) -- lose it and every table needs a full
re-extract, because nothing else records how far the replica is synced.
This engine already persists the watermark INSIDE every published
version's ``_MANIFEST.json`` (merge versions carry ``watermark``,
snapshot versions carry ``extract_started`` -- the K5 job-artifact
trail), so the state file is recoverable metadata, not a single point
of failure: walk each table's versions newest-first, take the first
manifest that records a sync position, and re-seed a fresh SyncState
from it. The recovered watermark is exactly the one the lost ledger
held at its last successful publish, so the next incremental tick
continues from there -- overlap-free in the common case, and any
crash-window overlap is absorbed by the idempotent PK merge (the same
strict-``>`` + merge contract that makes normal ticks safe).

No data moves: recovery reads one small JSON per retained version at
worst, O(tables x versions) driver-side metadata -- nothing scales
with table bytes, which is what makes it viable for a 1000-table fleet
on 100 TB.
"""

from __future__ import annotations

from datetime import datetime

from pgsf_spark.operators.table_store import TableStore
from pgsf_spark.sync.state import SyncState


def recover_watermark(store: TableStore, table: str) -> datetime:
    """The last sync position recorded in ``table``'s manifest trail.

    Newest-first: a merge manifest's ``watermark_after`` is the
    post-tick position (preferred -- the recovered ledger continues
    without re-reading the applied window); its ``watermark`` is the
    window START (a safe fallback for versions published before
    watermark_after existed: re-reads one window, absorbed by the
    idempotent merge); a snapshot manifest's ``extract_started`` is the
    C6 seed. Maintenance versions (compact/rollback) change layout, not
    sync position, but they CARRY the position forward from the version
    they rewrite (compact copies the watermark fields, rollback copies
    its whole source manifest) so sync -> compact -> vacuum down to an
    all-maintenance trail still recovers; a maintenance version from
    before that carry-forward existed simply has no position and is
    skipped.
    """
    versions = store.versions(table)
    if not versions:
        raise FileNotFoundError(f"table {table!r} has no published version")
    for version in reversed(versions):
        m = store.manifest(table, version)
        pos = (
            m.get("watermark_after")
            or m.get("watermark")
            or m.get("extract_started")
        )
        if pos:
            return datetime.fromisoformat(pos)
    raise FileNotFoundError(
        f"table {table!r}: no retained manifest records a sync position "
        "(all watermark-bearing versions vacuumed?) -- bulk-load to re-seed"
    )


def recover_state(
    store: TableStore,
    state: SyncState,
    tables: list[str],
    refresh_minutes: int = 10,
    overwrite: bool = False,
) -> dict[str, str]:
    """Re-seed ``state`` for every table from the store's manifests.

    Returns {table: recovered watermark ISO}. All-or-nothing per table:
    a table with no recoverable position raises before any ticks run,
    so the caller bulk-loads it instead of silently full-scanning.

    Recovery targets a LOST ledger. ``state`` already holding a row for
    any requested table means this is not the disaster the tool exists
    for -- ``insert`` would clobber in-flight state (including a RUNNING
    claim) and could move a live watermark backward, so that raises
    unless the caller passes ``overwrite=True`` explicitly.
    """
    if not overwrite:
        existing = sorted(t for t in tables if state.get(t) is not None)
        if existing:
            raise RuntimeError(
                f"recover_state: ledger already has rows for {existing} -- "
                "recovery re-seeds a LOST ledger; pass overwrite=True to "
                "clobber live state deliberately"
            )
    recovered: dict[str, datetime] = {
        t: recover_watermark(store, t) for t in tables
    }
    for t, wm in recovered.items():
        state.insert(t, syncuntil=wm, refresh_minutes=refresh_minutes)
    return {t: wm.isoformat() for t, wm in recovered.items()}

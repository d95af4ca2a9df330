"""Catalog-committed sync waves: all-or-nothing multi-table ticks.

``SyncRunner.run_due`` gives per-table isolation (one table's failure
never blocks another's tick -- the reference's one-process-per-table
model, sync:13-20). ``CatalogStore`` gives cross-table consistent READS.
This module ties them together into the operational story a fleet
actually needs: each scheduler tick is a WAVE, and the catalog pointer
flips only when every due table in the wave succeeded. A partially
failed wave leaves individual table pointers wherever their own ticks
landed (their versions are retained and consistent per-table), but
catalog readers keep the last fully-consistent multi-table snapshot --
nobody downstream ever joins a half-advanced pair. The flip itself is
CAS'd against the catalog version the wave started from, so two
concurrent wave drivers cannot silently overwrite each other's commit.

Cost: one tiny JSON publish per successful wave; no data movement
beyond what the ticks already did.
"""

from __future__ import annotations

from pgsf_spark.operators.catalog import CatalogStore
from pgsf_spark.sync.runner import SyncRunner


def run_wave(
    runner: SyncRunner,
    catalog: CatalogStore,
    tables: list[str],
    pks: dict[str, str] | None = None,
    ts_fields: dict[str, str] | None = None,
    max_workers: int = 8,
) -> dict:
    """One scheduler tick + a catalog commit iff the whole wave succeeded.

    Returns {"results": run_due results, "failed": [tables whose tick
    errored], "catalog_version": new version or None}. ``None`` means
    the catalog held the line: either nothing was due, or at least one
    due table failed (its claim is back to ready -- the NEXT wave
    retries it and commits then).
    """
    expect = catalog.current_version()
    results = runner.run_due(max_workers=max_workers, pks=pks, ts_fields=ts_fields)
    by = {r.get("table"): r for r in results}
    due = [t for t in tables if t in by]
    failed = [t for t in due if "error" in by[t]]
    out = {"results": results, "failed": failed, "catalog_version": None}
    if due and not failed:
        out["catalog_version"] = catalog.snapshot_current(
            runner.store, tables, expect_version=expect
        )
    return out

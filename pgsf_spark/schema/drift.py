"""Schema-drift classification for the sync ingest path.

The reference's sync loop carries an OPEN TODO for exactly this failure
(reference query_poll_table.py:202, ``TODO: detect some errors like a
column that disapeared``): when the source schema drifts between cycles
the reference surfaces an opaque driver error from cron and retries
forever. Here drift is DETECTED and CLASSIFIED against the replica's
schema before the merge touches data, and the sync runner routes each
class explicitly (SyncRunner.sync_table):

  - ``added``   -- new source columns: safe to WIDEN (the target gains
                   the column, pre-drift rows null) and ledgered in the
                   published version's manifest;
  - ``removed`` -- the source dropped a column: loud FAILURE by default
                   (every subsequent update would silently null the
                   replica's copy -- quiet data rot), permitted-and-
                   ledgered under ``drift_policy="allow-removed"``;
  - ``retyped`` -- same name, different type: NEVER auto-merged (a cast
                   under the reader is the reference's crash with extra
                   steps) -- always a loud failure before any write.

Classification compares Spark simpleString types, so ``decimal(10,2)``
vs ``decimal(12,2)`` is drift too. Internal columns (partition bucket,
file-order helper) are excluded by the caller via ``ignore``.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DriftReport:
    """Classified difference between a target schema and a batch schema."""

    added: tuple[tuple[str, str], ...]  # (name, batch type)
    removed: tuple[tuple[str, str], ...]  # (name, target type)
    retyped: tuple[tuple[str, str, str], ...]  # (name, target type, batch type)

    def __bool__(self) -> bool:
        return bool(self.added or self.removed or self.retyped)

    def describe(self) -> str:
        parts = []
        if self.added:
            parts.append(
                "added: " + ", ".join(f"{n} ({t})" for n, t in self.added)
            )
        if self.removed:
            parts.append(
                "removed: " + ", ".join(f"{n} ({t})" for n, t in self.removed)
            )
        if self.retyped:
            parts.append(
                "retyped: "
                + ", ".join(f"{n} ({a} -> {b})" for n, a, b in self.retyped)
            )
        return "; ".join(parts) if parts else "no drift"

    def manifest_entry(self) -> dict:
        """JSON-ready audit entry for the published version's manifest --
        the ledger that makes a widened/nulled column VISIBLE instead of
        quietly absorbed."""
        out: dict = {}
        if self.added:
            out["added"] = [{"column": n, "type": t} for n, t in self.added]
        if self.removed:
            out["removed"] = [{"column": n, "type": t} for n, t in self.removed]
        if self.retyped:
            out["retyped"] = [
                {"column": n, "from": a, "to": b} for n, a, b in self.retyped
            ]
        return out


def classify_drift(target_schema, batch_schema, ignore=frozenset()) -> DriftReport:
    """Classify the batch schema against the target schema.

    ``target_schema`` / ``batch_schema`` are Spark StructTypes; ``ignore``
    names columns outside the sync contract (internal partition/order
    helpers) that never count as drift.
    """
    t = {
        f.name: f.dataType.simpleString()
        for f in target_schema.fields
        if f.name not in ignore
    }
    b = {
        f.name: f.dataType.simpleString()
        for f in batch_schema.fields
        if f.name not in ignore
    }
    added = tuple((n, b[n]) for n in b if n not in t)
    removed = tuple((n, t[n]) for n in t if n not in b)
    retyped = tuple((n, t[n], b[n]) for n in t if n in b and t[n] != b[n])
    return DriftReport(added=added, removed=removed, retyped=retyped)

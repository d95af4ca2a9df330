"""Round-21 STAGED batch: retention-pipeline gates.

Round-14's engine fixes (compact carries the sync position forward;
vacuum accepts catalog-referenced versions as protected keeps) get
end-to-end driver-provable twins here: ``catalog_retention_gate`` runs
the catalog-GC-first retention pipeline over three published epochs, and
``maintenance_recovery_gate`` proves watermark recovery survives
compact -> vacuum -> ledger loss. Reference parity anchor: the
reference's age-based job GC (delete_old_jobs_data.sh:6-11) has no
notion of referenced snapshots -- this is the gap a versioned store
must close at fleet scale.

Same staging discipline as registry_r11..r20: promoted by
``QUERIES.update(STAGED_QUERIES_R21)`` in a later registration round,
never driver-visible before then. Verified by tests/test_r21_staged.py
through the driver-identical comparison.

LEAF imports only (spec.py, never registry). Every integer aggregate is
CAST to BIGINT in BOTH faces (the round-12 HUGEINT bind-type lesson).
"""

from __future__ import annotations

from pgsf_spark.analytics import retention
from pgsf_spark.analytics.spec import QuerySpec

_MID, _NEW = retention.RET_EPOCHS[1], retention.RET_EPOCHS[2]

STAGED_QUERIES_R21: dict[str, QuerySpec] = {
    "catalog_retention_gate": QuerySpec(
        retention.q_catalog_retention_gate,
        # Three epochs at factors 2/5/9; the catalog-aware store vacuum
        # protects all three (n_store_protected = 3); catalog GC retires
        # the oldest epoch, after which exactly its store version
        # collects (2 store + 2 catalog versions remain) and the two
        # retained epochs still read their full consistent sums.
        f"""WITH s AS (SELECT COALESCE(SUM(c_custkey), 0) AS sk FROM customer)
SELECT CAST({_MID} * sk AS BIGINT) AS sum_epoch_mid,
  CAST({_NEW} * sk AS BIGINT) AS sum_epoch_new,
  CAST({len(retention.RET_EPOCHS)} AS INT) AS n_store_protected,
  CAST({retention.RET_CAT_KEEP} AS INT) AS n_store_after_gc,
  CAST({retention.RET_CAT_KEEP} AS INT) AS n_catalog_after_gc
FROM s""",
    ),
    "maintenance_recovery_gate": QuerySpec(
        retention.q_maintenance_recovery_gate,
        # Final replica after snapshot -> merge tick (hours 3..4 at
        # MR_W1) -> compact -> vacuum(keep=1) -> LEDGER LOSS -> recovery
        # from the compacted manifest's carried watermark (T0+4h) ->
        # post-recovery tick (pk % 10 rows at MR_W2, stamped T0+6h).
        # Two versions remain: the maintenance rewrite + the new tick.
        f"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COALESCE(SUM(CASE WHEN c_custkey % {retention.MR_W2_MOD} = 0 THEN c_custkey * {retention.MR_W2}
       WHEN c_custkey % {retention.MR_HOUR_MOD} > {retention.MR_TICK1_FROM_HOURS} THEN c_custkey * {retention.MR_W1}
       ELSE c_custkey * {retention.MR_SNAP} END), 0) AS BIGINT) AS sum_v,
  CAST(COALESCE(SUM(CASE WHEN c_custkey % {retention.MR_W2_MOD} = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_window,
  CAST({retention.MR_HOUR_MOD - 1} AS BIGINT) AS recovered_wm_hours,
  CAST(2 AS INT) AS n_versions
FROM customer""",
    ),
}

assert len(STAGED_QUERIES_R21) == 2, len(STAGED_QUERIES_R21)

"""Round-19 STAGED batch: catalog-snapshot + state-recovery gates.

Unprompted depth: the two fleet-scale properties per-table versioning
alone cannot provide -- cross-table consistent snapshots (CatalogStore,
operators/catalog.py) and watermark disaster recovery from the store's
manifest trail (sync/recovery.py). Reference parity anchors: the
one-process-per-table sync model (sync:13-20) has the mixed-read hazard
the catalog closes; the reference's ``__sync`` ledger (synctable.py) is
unrecoverable when lost -- here the manifests make it derivable.

Same staging discipline as registry_r11..r18: promoted by
``QUERIES.update(STAGED_QUERIES_R19)`` in a later registration round,
never driver-visible before then. Verified by tests/test_r19_staged.py
through the driver-identical comparison.

LEAF imports only (spec.py, never registry). Every integer aggregate is
CAST to BIGINT in BOTH faces (the round-12 HUGEINT bind-type lesson).
"""

from __future__ import annotations

from pgsf_spark.analytics import recovery
from pgsf_spark.analytics.spec import QuerySpec

STAGED_QUERIES_R19: dict[str, QuerySpec] = {
    "catalog_snapshot_gate": QuerySpec(
        recovery.q_catalog_snapshot_gate,
        # Both tables carry v = epoch_factor * pk; the oracle restates
        # the pinned (3,3), mixed (7,3), and committed (7,7) pair sums
        # from the base tables alone. Two catalog versions published.
        f"""WITH s AS (
  SELECT (SELECT COALESCE(SUM(c_custkey), 0) FROM customer) AS sc,
         (SELECT COALESCE(SUM(o_orderkey), 0) FROM orders) AS so)
SELECT CAST({recovery.E1} * sc + {recovery.E1} * so AS BIGINT) AS sum_cat1,
  CAST({recovery.E2} * sc + {recovery.E1} * so AS BIGINT) AS sum_mixed,
  CAST({recovery.E2} * sc + {recovery.E2} * so AS BIGINT) AS sum_cat2,
  CAST(2 AS INT) AS n_catalog_versions
FROM s""",
    ),
    "fleet_catalog_wave_gate": QuerySpec(
        recovery.q_fleet_catalog_wave_gate,
        # Catalog-committed waves: the partial wave holds the epoch-1
        # pair (3,3) while the store is mixed (cust's wave landed, ords'
        # failed on retype drift); the completed wave commits the
        # epoch-2 pair. Wave rows are pk % 10 == 0 at 7*pk (delta 4*pk
        # over the 3*pk base). Two catalog versions: bootstrap + the one
        # successful wave.
        f"""WITH c AS (SELECT COALESCE(SUM(c_custkey), 0) AS sc,
  COALESCE(SUM(CASE WHEN c_custkey % {recovery.WAVE_UPDATE_MOD} = 0 THEN c_custkey ELSE 0 END), 0) AS scw
  FROM customer),
o AS (SELECT COALESCE(SUM(o_orderkey), 0) AS so,
  COALESCE(SUM(CASE WHEN o_orderkey % {recovery.WAVE_UPDATE_MOD} = 0 THEN o_orderkey ELSE 0 END), 0) AS sow
  FROM orders)
SELECT CAST({recovery.E1} * sc + {recovery.E1} * so AS BIGINT) AS sum_cat_held,
  CAST({recovery.E1} * sc + {recovery.E2 - recovery.E1} * scw + {recovery.E1} * so AS BIGINT) AS sum_store_mixed,
  CAST({recovery.E1} * sc + {recovery.E2 - recovery.E1} * scw + {recovery.E1} * so + {recovery.E2 - recovery.E1} * sow AS BIGINT) AS sum_cat_final,
  CAST(2 AS INT) AS n_catalog_versions
FROM c, o""",
    ),
    "cdf_changes_gate": QuerySpec(
        recovery.q_cdf_changes_gate,
        # The change feed between v1 and v2, restated from customer:
        # k % 11 deleted, else k % 7 updated (3k -> 7k), k % 13 spawning
        # an inserted key k + 10^7 at v = 5 * new_key. Unchanged rows
        # never appear. Deletes carry no new-side value (sum_v = 0).
        f"""WITH b AS (SELECT c_custkey AS k FROM customer)
SELECT * FROM (
  SELECT 'delete' AS change, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(k) AS BIGINT) AS sum_pk, CAST(SUM(0) AS BIGINT) AS sum_v
  FROM b WHERE k % {recovery.CDF_DEL_MOD} = 0 HAVING COUNT(*) > 0
  UNION ALL
  SELECT 'insert', CAST(COUNT(*) AS BIGINT),
    CAST(SUM(k + {recovery.CDF_INS_OFFSET}) AS BIGINT),
    CAST(SUM({recovery.CDF_V_INS} * (k + {recovery.CDF_INS_OFFSET})) AS BIGINT)
  FROM b WHERE k % {recovery.CDF_INS_MOD} = 0 HAVING COUNT(*) > 0
  UNION ALL
  SELECT 'update', CAST(COUNT(*) AS BIGINT), CAST(SUM(k) AS BIGINT),
    CAST(SUM({recovery.E2} * k) AS BIGINT)
  FROM b WHERE k % {recovery.CDF_UPD_MOD} = 0 AND k % {recovery.CDF_DEL_MOD} <> 0 HAVING COUNT(*) > 0
) ORDER BY change""",
    ),
    "state_recovery_gate": QuerySpec(
        recovery.q_state_recovery_gate,
        # Final replica after snapshot -> wave-1 tick -> LEDGER LOSS ->
        # manifest recovery -> wave-2 tick: wave-2 rows (pk % 10 == 0,
        # stamped after the recovered watermark) at V_WAVE2, wave-1 rows
        # (stamp hours 3..4) at V_WAVE1, everything else at V_SNAP. The
        # recovered watermark is the merge manifest's T0+4h; exactly one
        # version published post-recovery (snapshot + 2 ticks = 3).
        f"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN c_custkey % {recovery.REC_WAVE2_MOD} = 0 THEN c_custkey * {recovery.V_WAVE2}
       WHEN c_custkey % {recovery.REC_HOUR_MOD} > {recovery.REC_TICK1_FROM_HOURS} THEN c_custkey * {recovery.V_WAVE1}
       ELSE c_custkey * {recovery.V_SNAP} END) AS BIGINT) AS sum_v,
  CAST(SUM(CASE WHEN c_custkey % {recovery.REC_WAVE2_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_window,
  CAST({recovery.REC_HOUR_MOD - 1} AS BIGINT) AS recovered_wm_hours,
  CAST(3 AS INT) AS n_versions
FROM customer""",
    ),
}

assert len(STAGED_QUERIES_R19) == 4, len(STAGED_QUERIES_R19)

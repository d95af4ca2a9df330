"""Round-20 STAGED batch: epoch-pinned join + recovery-then-wave gates.

VERDICT r13 asks #5/#6: extend the catalog-consistency story from
per-table sums to the actual reader shape (a customer JOIN orders
executed through one ``CatalogStore.pin()`` mid-wave -- the torn read
would change the join aggregate) and compose disaster recovery with a
catalog-committed wave (``recover_state`` re-seeds a lost ledger for N
tables, then one ``run_wave`` returns the fleet to a consistent epoch).
Reference parity anchor: the per-table transaction model whose
cross-table gap these close (sync:13-20).

Same staging discipline as registry_r11..r19: promoted by
``QUERIES.update(STAGED_QUERIES_R20)`` in a later registration round,
never driver-visible before then. Verified by tests/test_r20_staged.py
through the driver-identical comparison.

LEAF imports only (spec.py, never registry). Every integer aggregate is
CAST to BIGINT in BOTH faces (the round-12 HUGEINT bind-type lesson).
"""

from __future__ import annotations

from pgsf_spark.analytics import epochs
from pgsf_spark.analytics.spec import QuerySpec

STAGED_QUERIES_R20: dict[str, QuerySpec] = {
    "catalog_join_pin_gate": QuerySpec(
        epochs.q_catalog_join_pin_gate,
        # The reader joins orders to customer through ONE pinned catalog
        # epoch. Pinned = epoch-1 pair (3ck + 3ok per match), torn =
        # epoch-2 cust against epoch-1 ords (7ck + 3ok -- a pair no epoch
        # committed), committed = epoch-2 pair (7ck + 7ok). Two catalog
        # versions published.
        f"""WITH j AS (
  SELECT c.c_custkey AS ck, o.o_orderkey AS ok
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
SELECT CAST(COUNT(*) AS BIGINT) AS n_matches,
  CAST(COALESCE(SUM({epochs.J_E1} * ck + {epochs.J_E1} * ok), 0) AS BIGINT) AS sum_join_pinned,
  CAST(COALESCE(SUM({epochs.J_E2} * ck + {epochs.J_E1} * ok), 0) AS BIGINT) AS sum_join_torn,
  CAST(COALESCE(SUM({epochs.J_E2} * ck + {epochs.J_E2} * ok), 0) AS BIGINT) AS sum_join_committed,
  CAST(2 AS INT) AS n_catalog_versions
FROM j""",
    ),
    "recovery_wave_gate": QuerySpec(
        epochs.q_recovery_wave_gate,
        # Final replica after snapshot -> wave 1 (hours 3..4 at RW_W1,
        # catalog epoch 1) -> LEDGER LOSS -> manifest recovery (both
        # tables land on the merge manifests' T0+4h) -> wave 2 (pk % 10
        # rows at RW_W2, stamped T0+6h, catalog epoch 2). Wave-2 rows
        # have pk % 5 == 0, so the CASE arms are disjoint.
        f"""WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COALESCE(SUM(CASE WHEN c_custkey % {epochs.RW_W2_MOD} = 0 THEN c_custkey * {epochs.RW_W2}
       WHEN c_custkey % {epochs.RW_HOUR_MOD} > {epochs.RW_TICK1_FROM_HOURS} THEN c_custkey * {epochs.RW_W1}
       ELSE c_custkey * {epochs.RW_SNAP} END), 0) AS BIGINT) AS s
  FROM customer),
o AS (SELECT
  CAST(COALESCE(SUM(CASE WHEN o_orderkey % {epochs.RW_W2_MOD} = 0 THEN o_orderkey * {epochs.RW_W2}
       WHEN o_orderkey % {epochs.RW_HOUR_MOD} > {epochs.RW_TICK1_FROM_HOURS} THEN o_orderkey * {epochs.RW_W1}
       ELSE o_orderkey * {epochs.RW_SNAP} END), 0) AS BIGINT) AS s
  FROM orders)
SELECT c.n AS n_rows_cust, c.s AS sum_v_cust, o.s AS sum_v_ords,
  CAST({epochs.RW_HOUR_MOD - 1} AS BIGINT) AS recovered_wm_hours,
  CAST(2 AS INT) AS n_catalog_versions
FROM c, o""",
    ),
}

assert len(STAGED_QUERIES_R20) == 2, len(STAGED_QUERIES_R20)

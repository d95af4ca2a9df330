"""Round-15 STAGED batch: the fleet-scheduler + snapshot-consistency gates.

The round-11 verdict's post-r13 depth plan (ask #6) named the fleet
scheduler and snapshot-consistency surfaces; round 12 built them, plus
two unprompted siblings from the same family (version GC / C7
end-to-end, and the CAS no-lost-update publish contract). Same staging
discipline as registry_r11/r12/r13/r14: mirrors the live ``QUERIES``
contract, promoted by ``QUERIES.update(STAGED_QUERIES_R15)`` in a later
round, never driver-visible before then. Verified by
tests/test_r15_staged.py through the driver-identical comparison.

Both fixtures derive from sf base tables with deterministic key
arithmetic (``analytics/fleet.py`` module docstring), so each oracle
restates the engine workflow's expected END STATE -- the post-recovery
replica sums and publish cadence of a four-table scheduler fleet, and
the three version states a pinned reader / time-travel read / current
read must see under a concurrent merge writer -- from the base tables
alone.

LEAF imports only (spec.py, not registry): if a future registration
round imports this module at registry.py's bottom, importing registry
from here would re-create the import-order cycle the spec.py split
removed. Collision asserts against the live registry live in the test
file for the same reason.
"""

from __future__ import annotations

from pgsf_spark.analytics import fleet
from pgsf_spark.analytics.spec import QuerySpec

_FLEET_ARMS = "\n  UNION ALL\n".join(
    f"""  SELECT '{name}' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
    CAST(SUM(CASE WHEN {pk} % {fleet.UPDATE_MOD} = 0
             THEN {fleet.V_WAVE1} * {pk}
             ELSE {fleet.V_SNAP} * {pk} END) AS BIGINT) AS sum_v,
    CAST({2 if name == fleet.FAIL_TABLE else 3} AS INT) AS n_versions,
    {'TRUE' if name == fleet.FAIL_TABLE else 'FALSE'} AS tick1_failed
  FROM {base}"""
    for name, base, pk, _ in fleet.FLEET
)

STAGED_QUERIES_R15: dict[str, QuerySpec] = {
    # the poisoned table reaches the SAME final sums one tick later (its
    # failed tick published nothing: n_versions 2, not 3)
    "fleet_scheduler_gate": QuerySpec(
        fleet.q_fleet_scheduler_gate,
        f"""WITH t AS (
{_FLEET_ARMS}
)
SELECT tbl, n_rows, sum_v, n_versions, tick1_failed FROM t ORDER BY tbl""",
    ),
    # later wave wins for keys in both: pk % 50 keys end at 13*pk even
    # when pk % 10 also matched the earlier wave
    "vacuum_retention_gate": QuerySpec(
        fleet.q_vacuum_retention_gate,
        f"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN c_custkey % {fleet.THIRD_MOD} = 0
           THEN {fleet.V_WAVE3} * c_custkey
           WHEN c_custkey % {fleet.UPDATE_MOD} = 0
           THEN {fleet.V_WAVE1} * c_custkey
           ELSE {fleet.V_SNAP} * c_custkey END) AS BIGINT) AS sum_v,
  CAST(3 AS INT) AS n_versions_start,
  CAST(1 AS INT) AS n_victims_keep,
  CAST(1 AS INT) AS n_victims_ttl,
  CAST(1 AS INT) AS n_versions_end
FROM customer""",
    ),
    # B merged after A, so B's wave wins the pk % 70 overlap; the dir
    # count pins the loser's documented orphan (snapshot + A + orphan +
    # retry = 4)
    "cas_publish_gate": QuerySpec(
        fleet.q_cas_publish_gate,
        f"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN c_custkey % {fleet.UPDATE_MOD} = 0
           THEN {fleet.V_WAVE1} * c_custkey
           ELSE {fleet.V_SNAP} * c_custkey END) AS BIGINT) AS sum_after_a,
  CAST(SUM(CASE WHEN c_custkey % {fleet.CAS_MOD} = 0
           THEN {fleet.V_CAS} * c_custkey
           WHEN c_custkey % {fleet.UPDATE_MOD} = 0
           THEN {fleet.V_WAVE1} * c_custkey
           ELSE {fleet.V_SNAP} * c_custkey END) AS BIGINT) AS sum_final,
  CAST(4 AS INT) AS n_version_dirs
FROM customer""",
    ),
    "snapshot_consistency_gate": QuerySpec(
        fleet.q_snapshot_consistency_gate,
        f"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM({fleet.V_SNAP} * c_custkey) AS BIGINT) AS sum_v1,
  CAST(SUM(CASE WHEN c_custkey % {fleet.UPDATE_MOD} = 0
           THEN {fleet.V_WAVE1} * c_custkey
           ELSE {fleet.V_SNAP} * c_custkey END) AS BIGINT) AS sum_v2,
  CAST(SUM(CASE WHEN c_custkey % {fleet.SECOND_MOD} = 0
           THEN {fleet.V_WAVE2} * c_custkey
           WHEN c_custkey % {fleet.UPDATE_MOD} = 0
           THEN {fleet.V_WAVE1} * c_custkey
           ELSE {fleet.V_SNAP} * c_custkey END) AS BIGINT) AS sum_v3,
  CAST(3 AS INT) AS n_versions
FROM customer""",
    ),
}

assert len(STAGED_QUERIES_R15) == 4, len(STAGED_QUERIES_R15)

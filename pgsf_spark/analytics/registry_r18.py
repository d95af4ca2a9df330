"""Round-18 STAGED batch: C6 bootstrap-seed + K4b upload-results gates.

The two gates VERDICT r12 asked for (asks #4 and #5): the first-load
watermark bootstrap (extract-start seed, boundary re-fetch, strict-``>``
exclusion, idempotent re-apply -- csv_to_postgres.py:94,
synctable.py:83-106, query_poll_table.py:76-83) and the reverse-ETL
result-parsing leg (per-record Id/Success/Created/Error outcomes +
chunk accounting -- salesforce_bulk.py:498-546), composed end-to-end
through the real SyncRunner / upload operator machinery.

Same staging discipline as registry_r11..r17: mirrors the live
``QUERIES`` contract, promoted by ``QUERIES.update(STAGED_QUERIES_R18)``
in a later registration round, never driver-visible before then.
Verified by tests/test_r18_staged.py through the driver-identical
comparison.

LEAF imports only (spec.py, never registry): registry.py's future
registration block imports this module at its bottom, so importing
registry from here would re-create the import-order cycle the spec.py
split removed. Collision asserts against the live registry live in the
staging test.

Oracle bind-type discipline (round-12 lesson): every integer aggregate
is CAST to BIGINT in BOTH faces -- DuckDB types bare SUM(int) as
HUGEINT, which the live-registry hashability lint rejects.
"""

from __future__ import annotations

from pgsf_spark.analytics import bootstrap
from pgsf_spark.analytics.spec import QuerySpec

STAGED_QUERIES_R18: dict[str, QuerySpec] = {
    "bootstrap_seed_gate": QuerySpec(
        bootstrap.q_bootstrap_seed_gate,
        # Final replica state after snapshot + one boundary tick,
        # restated from customer alone: boundary rows (stamp hours 3..4,
        # strictly after the hour-2 extract start) carry their
        # mid-extract V_NEW update; the hour-2 rows keep V_OLD -- the
        # post-snapshot V_POISON write at exactly extract-start must
        # never land (strict ``>``); the watermark ends at max(ts) =
        # T0 + 4h.
        f"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(CASE WHEN c_custkey % {bootstrap.BOOT_HOUR_MOD} > {bootstrap.BOOT_EXTRACT_HOURS}
       THEN c_custkey * {bootstrap.V_NEW}
       ELSE c_custkey * {bootstrap.V_OLD} END) AS BIGINT) AS sum_v,
  CAST(SUM(CASE WHEN c_custkey % {bootstrap.BOOT_HOUR_MOD} > {bootstrap.BOOT_EXTRACT_HOURS}
       THEN 1 ELSE 0 END) AS BIGINT) AS n_refetched,
  CAST({bootstrap.BOOT_HOUR_MOD - 1} AS BIGINT) AS wm_advance_hours
FROM customer""",
    ),
    "upload_results_gate": QuerySpec(
        bootstrap.q_upload_results_gate,
        # Per-record outcome routing + chunk accounting restated from
        # customer: Id % 7 == 0 rejected (DUPLICATE_VALUE, no id),
        # everything else created with the echoed id; chunk count is
        # ceil division at the record cap (the face feeds one partition
        # so the cap is the only chunk boundary).
        f"""SELECT CAST(COUNT(*) AS BIGINT) AS n_records,
  CAST(CEIL(COUNT(*) / {bootstrap.UPLOAD_MAX_RECORDS}.0) AS BIGINT) AS n_chunks,
  CAST(SUM(CASE WHEN c_custkey % {bootstrap.UPLOAD_FAIL_MOD} <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_success,
  CAST(SUM(CASE WHEN c_custkey % {bootstrap.UPLOAD_FAIL_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_failed_dup,
  CAST(SUM(CASE WHEN c_custkey % {bootstrap.UPLOAD_FAIL_MOD} <> 0 THEN c_custkey ELSE 0 END) AS BIGINT) AS sum_ok_ids
FROM customer""",
    ),
}

assert len(STAGED_QUERIES_R18) == 2, len(STAGED_QUERIES_R18)

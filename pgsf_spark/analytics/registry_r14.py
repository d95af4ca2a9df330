"""Round-14 STAGED batch: the depth-over-breadth robustness gates.

PERF.md "Round-14 plan" chose engine robustness over more statistics;
these two queries make that work DRIVER-PROVABLE (a CORRECTNESS row per
behavior) instead of pytest-only. Same staging discipline as
registry_r11/r12/r13: mirrors the live ``QUERIES`` contract, promoted by
``QUERIES.update(STAGED_QUERIES_R14)`` in its round, never
driver-visible before then. Verified by tests/test_r14_staged.py.

Both fixtures derive from ``documents`` with deterministic doc_id
arithmetic, so each oracle restates the expected END STATE of the
engine workflow (widened replica / quarantined landing zone) from the
base table alone.
"""

from __future__ import annotations

# LEAF imports only (spec.py, never registry): registry.py's ROUND-13
# REGISTRATION block imports this module at its bottom, so importing
# registry from here would re-create the import-order cycle the spec.py
# split removed. Collision asserts against the live registry moved to
# registry.py's promotion block (and tests/test_r14_staged.py).
from pgsf_spark.analytics import robustness
from pgsf_spark.analytics.spec import QuerySpec

STAGED_QUERIES_R14: dict[str, QuerySpec] = {
    "schema_drift_gate": QuerySpec(
        robustness.q_schema_drift_gate,
        f"""SELECT source, COUNT(*) AS n_docs,
  COUNT(CASE WHEN doc_id % {robustness.DRIFT_MOD} = 0 THEN 1 END) AS n_with_lang,
  COUNT(DISTINCT CASE WHEN doc_id % {robustness.DRIFT_MOD} = 0
        THEN 'L' || CAST(doc_id % 7 AS VARCHAR) END) AS n_lang_variants,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
  'lang' AS drift_added
FROM documents GROUP BY source ORDER BY source""",
    ),
    "integrity_quarantine_gate": QuerySpec(
        robustness.q_integrity_quarantine_gate,
        f"""SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
  MIN(doc_id) AS min_doc,
  CAST(1 AS BIGINT) AS n_quarantined,
  'bucket-{robustness.CORRUPT_VICTIM}.parquet' AS quarantined_file
FROM documents WHERE doc_id % {robustness.CORRUPT_BUCKETS} <> {robustness.CORRUPT_VICTIM}
GROUP BY source ORDER BY source""",
    ),
}

assert len(STAGED_QUERIES_R14) == 2, len(STAGED_QUERIES_R14)

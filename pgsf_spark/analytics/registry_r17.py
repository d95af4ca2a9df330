"""Round-17 STAGED batch: reference API surfaces, driver-proven.

Four SURVEY §2 surfaces that were pytest-only in the coverage table
(SOSL search, query/queryMore paging, the updated/deleted-ids CDC
windows, version compaction) re-expressed as oracle-gated queries --
see ``analytics/refsurfaces.py``. Same staging discipline as
registry_r11..r16; promoted by ``QUERIES.update(STAGED_QUERIES_R17)``
in a later round. Verified by tests/test_r17_staged.py; oracle
bind-type lint covers the batch pre-registration.

LEAF imports only (spec.py, not registry).
"""

from __future__ import annotations

from pgsf_spark.analytics import refsurfaces
from pgsf_spark.analytics.spec import QuerySpec

STAGED_QUERIES_R17: dict[str, QuerySpec] = {
    # ALL FIELDS = every string column of documents (text, lang, source);
    # the soft-delete default is a no-op here (documents has no IsDeleted)
    "sosl_search_gate": QuerySpec(
        refsurfaces.q_sosl_search_gate,
        f"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_hits,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents
WHERE (contains(lower(text), '{refsurfaces.SOSL_TERM}')
    OR contains(lower(lang), '{refsurfaces.SOSL_TERM}')
    OR contains(lower(source), '{refsurfaces.SOSL_TERM}'))
  AND n_chars > {refsurfaces.SOSL_MIN_CHARS}
GROUP BY source ORDER BY source""",
    ),
    # the face rebuilds the totals from the PAGES and asserts no key is
    # seen twice; the oracle restates the page math from orders
    "query_pages_gate": QuerySpec(
        refsurfaces.q_query_pages_gate,
        f"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(CEIL(COUNT(*) / {refsurfaces.PAGE_SIZE}.0) AS BIGINT) AS n_pages,
  CAST(CASE WHEN COUNT(*) = 0 THEN 0
            WHEN COUNT(*) % {refsurfaces.PAGE_SIZE} = 0 THEN {refsurfaces.PAGE_SIZE}
            ELSE COUNT(*) % {refsurfaces.PAGE_SIZE} END AS BIGINT) AS last_page_rows,
  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
FROM orders""",
    ),
    "cdc_id_scans_gate": QuerySpec(
        refsurfaces.q_cdc_id_scans_gate,
        f"""WITH w AS (
  SELECT c_custkey AS pk,
    c_custkey % {refsurfaces.CDC_HOUR_MOD}
      BETWEEN {refsurfaces.CDC_WIN_LO} AND {refsurfaces.CDC_WIN_HI} AS in_win,
    c_custkey % {refsurfaces.CDC_DEL_MOD} = 0 AS del
  FROM customer)
SELECT CAST(COUNT(CASE WHEN in_win THEN 1 END) AS BIGINT) AS n_updated,
  CAST(SUM(CASE WHEN in_win THEN pk END) AS BIGINT) AS sum_updated,
  MIN(CASE WHEN in_win THEN pk END) AS min_updated,
  CAST(COUNT(CASE WHEN in_win AND del THEN 1 END) AS BIGINT) AS n_deleted,
  CAST(SUM(CASE WHEN in_win AND del THEN pk END) AS BIGINT) AS sum_deleted
FROM w""",
    ),
    "compaction_gate": QuerySpec(
        refsurfaces.q_compaction_gate,
        f"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(SUM(3 * c_custkey) AS BIGINT) AS sum_v,
  CAST({refsurfaces.COMPACT_FILES_BEFORE} AS INT) AS files_before,
  CAST({refsurfaces.COMPACT_FILES_AFTER} AS INT) AS files_after,
  CAST(2 AS INT) AS n_versions
FROM customer""",
    ),
}

assert len(STAGED_QUERIES_R17) == 4, len(STAGED_QUERIES_R17)

"""Round-13 STAGED query batch: Spark 4 SQL-language surfaces + sink leg.

Same staging discipline as registry_r11 / registry_r12: mirrors the live
``QUERIES`` contract, promoted by ``QUERIES.update(STAGED_QUERIES_R13)``
in its round, never driver-visible before then. Verified by
tests/test_r13_staged.py through ``pgsf_spark.verify.verify_queries``.

Batch plan: PERF.md "Round-13 seed". 8 names, all full-oracle: the six
round-10 builds plus the two seed leftovers built in round 11
(observe_metrics_gate, chunked_stream_sink_gate -- VERDICT r10 ask #4).
The recursive-CTE oracle is itself a DuckDB recursive CTE -- the two
engines run the same recursion independently.
"""

from __future__ import annotations

# LEAF imports only (spec.py, never registry): registry.py's ROUND-13
# REGISTRATION block imports this module at its bottom, so importing
# registry from here would re-create the import-order cycle the spec.py
# split removed. Collision asserts against the live registry moved to
# registry.py's promotion block (and tests/test_r13_staged.py).
from pgsf_spark.analytics import sqlsurfaces
from pgsf_spark.analytics.spec import QuerySpec

STAGED_QUERIES_R13: dict[str, QuerySpec] = {
    "recursive_cte_closure": QuerySpec(
        sqlsurfaces.q_recursive_cte_closure,
        """WITH RECURSIVE walk(c, cur, d) AS (
  SELECT c_custkey, c_custkey, 0
  FROM customer WHERE c_custkey BETWEEN 1 AND 255
  UNION ALL
  SELECT c, cur // 2, d + 1 FROM walk WHERE cur > 1
),
depths AS (SELECT c, MAX(d) AS depth FROM walk GROUP BY c)
SELECT depth, COUNT(*) AS n_customers, CAST(SUM(c) AS BIGINT) AS sum_keys
FROM depths GROUP BY depth ORDER BY depth""",
    ),
    "pipe_syntax_parity": QuerySpec(
        sqlsurfaces.q_pipe_syntax_parity,
        """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price
FROM lineitem WHERE l_quantity < 24
GROUP BY 1, 2 ORDER BY 1, 2""",
    ),
    "sql_udf_gate": QuerySpec(
        sqlsurfaces.q_sql_udf_gate,
        """SELECT l_returnflag, COUNT(*) AS n,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)))
       AS DOUBLE) AS revenue
FROM lineitem GROUP BY 1 ORDER BY 1""",
    ),
    "sql_table_udf_gate": QuerySpec(
        sqlsurfaces.q_sql_table_udf_gate,
        """WITH h AS (
  SELECT LEAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT), 7) AS b,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS total
  FROM orders GROUP BY 1)
SELECT s.b AS bucket, COALESCE(h.n, 0) AS n_orders,
       COALESCE(h.total, 0.0) AS sum_price
FROM (SELECT range AS b FROM range(8)) s LEFT JOIN h ON s.b = h.b
ORDER BY s.b""",
    ),
    "collation_gate": QuerySpec(
        sqlsurfaces.q_collation_gate,
        """WITH m AS (
  SELECT CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN upper(lang)
           WHEN 1 THEN lang
           ELSE concat(upper(substring(lang, 1, 1)), substring(lang, 2))
         END AS mixed
  FROM documents)
SELECT lower(MIN(mixed)) AS lang, COUNT(*) AS n_docs,
       COUNT(DISTINCT mixed) AS n_case_variants
FROM m GROUP BY lower(mixed) ORDER BY lang""",
    ),
    "chunked_sink_gate": QuerySpec(
        sqlsurfaces.q_chunked_sink_gate,
        """SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents GROUP BY 1 ORDER BY 1""",
    ),
    # --- the two round-10-seed leftovers, built in round 11 ---------------
    "observe_metrics_gate": QuerySpec(
        sqlsurfaces.q_observe_metrics_gate,
        """WITH m AS (
  SELECT COUNT(*) AS n_in,
    CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty_in,
    COUNT(*) FILTER (WHERE l_quantity < 24) AS n_kept,
    CAST(SUM(CAST(l_quantity AS DECIMAL(27,4)))
         FILTER (WHERE l_quantity < 24) AS DOUBLE) AS sum_qty_kept
  FROM lineitem)
SELECT CAST(n_in AS BIGINT) AS n_in, CAST(n_kept AS BIGINT) AS n_kept,
  sum_qty_in, sum_qty_kept,
  CAST(CASE WHEN n_in = 0 THEN 0 ELSE n_kept * 1000 // n_in END
       AS BIGINT) AS kept_permille
FROM m""",
    ),
    "chunked_stream_sink_gate": QuerySpec(
        sqlsurfaces.q_chunked_stream_sink_gate,
        """SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM documents GROUP BY 1 ORDER BY 1""",
    ),
}

assert len(STAGED_QUERIES_R13) == 8, len(STAGED_QUERIES_R13)

"""Round-12 STAGED query batch: semi-structured + Python-engine surfaces.

Like ``registry_r11``, this mirrors the live registry's ``QUERIES``
contract (same QuerySpec, same oracle-parity rules). Round 12 promoted
the batch exactly as staged: registry.py's ROUND-12 REGISTRATION block
is the promised one-line ``QUERIES.update(STAGED_QUERIES_R12)``.

Verified by tests/test_r12_staged.py through the same
``pgsf_spark.verify.verify_queries`` machinery the round driver uses.

Batch plan: PERF.md "Round-12 plan" -- semi-structured data (VARIANT,
XML, from_json, maps, higher-order arrays), the Python engine surfaces
(Arrow UDTF, mapInArrow), the state-store reader (checkpoint state
as a DataFrame), and the Python DataSource API (sources/pyds.py paged
entity source with typed filter pushdown, batch and streaming-CDC legs).
11 names, all full-oracle.

Oracle design notes:
  - the JSON gates' oracles compute from the BASE columns the JSON was
    constructed from (round-trip identity), so parse/escape/cast bugs
    hash-mismatch; nothing JSON-shaped crosses the engine boundary.
  - variant_typeof_profile pins Spark's variant type-inference STRINGS
    (measured on pyspark 4.1.2: BIGINT / STRING / ARRAY<BIGINT> /
    OBJECT<k: BIGINT>); an engine upgrade that renames them goes red
    here, not silently downstream.
  - float aggregation follows oracle_utils exact-decimal accumulation;
    list math uses the product-then-cast DECIMAL(20,10) form on BOTH
    sides so per-element rounding is identical.
"""

from __future__ import annotations

from pgsf_spark.analytics import semistructured

# LEAF imports only (spec.py, not registry): registry.py's ROUND-12
# REGISTRATION block imports THIS module at its bottom, so importing
# registry from here would make the module import-order-dependent
# (the same cycle registry_r11-first closed before the spec.py split)
from pgsf_spark.analytics.spec import _NORM, QuerySpec
from pgsf_spark.streaming import faces as _faces

STAGED_QUERIES_R12: dict[str, QuerySpec] = {
    "variant_shred": QuerySpec(
        semistructured.q_variant_shred,
        """SELECT o_orderstatus AS status, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_total,
  COUNT(DISTINCT year(o_orderdate)) AS n_years,
  COUNT(CAST(NULL AS VARCHAR)) AS n_missing,
  COUNT(CASE WHEN regexp_matches(o_orderpriority, '^-?\\d+$') THEN 1 END) AS n_prio_int
FROM orders GROUP BY 1 ORDER BY 1""",
    ),
    "variant_typeof_profile": QuerySpec(
        semistructured.q_variant_typeof_profile,
        """WITH v AS (
  SELECT doc_id,
    CASE doc_id % 4 WHEN 0 THEN 'BIGINT' WHEN 1 THEN 'STRING'
      WHEN 2 THEN 'ARRAY<BIGINT>' ELSE 'OBJECT<k: BIGINT>' END AS vtype
  FROM documents)
SELECT vtype, COUNT(*) AS n, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM v GROUP BY 1 ORDER BY 1""",
    ),
    "from_json_corrupt_gate": QuerySpec(
        semistructured.q_from_json_corrupt_gate,
        """WITH p AS (
  SELECT doc_id, source, (doc_id % 7 <> 3) AS valid,
    CASE WHEN doc_id % 7 <> 3 THEN n_chars END AS nc,
    CASE WHEN doc_id % 7 <> 3 THEN 1 END AS meta_ok
  FROM documents)
SELECT valid, COUNT(*) AS n, CAST(SUM(nc) AS BIGINT) AS sum_chars,
  CAST(SUM(meta_ok) AS BIGINT) AS n_meta_ok, COUNT(DISTINCT source) AS n_sources
FROM p GROUP BY 1 ORDER BY 1""",
    ),
    "map_reshape_gate": QuerySpec(
        semistructured.q_map_reshape_gate,
        """WITH c AS (SELECT source, lang, COUNT(*) AS n FROM documents GROUP BY 1, 2),
t AS (SELECT source, SUM(n) AS total_docs,
        CAST(COUNT(CASE WHEN n >= 5 THEN 1 END) AS INT) AS n_langs_5plus
      FROM c GROUP BY 1)
SELECT c.source, c.lang, ROUND(c.n / t.total_docs, 6) AS share,
  CAST(t.total_docs AS BIGINT) AS total_docs, t.n_langs_5plus
FROM c JOIN t USING (source) ORDER BY source, lang""",
    ),
    "higher_order_chain": QuerySpec(
        semistructured.q_higher_order_chain,
        """WITH u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x, len(embedding) AS n
  FROM embeddings),
rev AS (
  SELECT a.vec_id,
    CAST(SUM(CAST(a.x * b.x AS DECIMAL(20,10))) AS DOUBLE) AS rev_dot
  FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.i = a.n + 1 - a.i
  GROUP BY 1),
st AS (
  SELECT vec_id,
    CAST(COUNT(CASE WHEN x > 0 THEN 1 END) AS INT) AS n_pos,
    CAST(SUM(CAST(abs(x) AS DECIMAL(20,10))) AS DOUBLE) AS l1_norm
  FROM u GROUP BY 1)
SELECT rev.vec_id, ROUND(rev.rev_dot, 6) AS rev_dot, st.n_pos,
  ROUND(st.l1_norm, 6) AS l1_norm
FROM rev JOIN st USING (vec_id) ORDER BY vec_id""",
    ),
    "udtf_bigram_topk": QuerySpec(
        semistructured.q_udtf_bigram_topk,
        f"""WITH toks AS (SELECT doc_id, string_split({_NORM}, ' ') AS t FROM documents),
g AS (
  SELECT unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i + 1])) AS gram
  FROM toks)
SELECT gram, COUNT(*) AS n FROM g
GROUP BY 1 ORDER BY n DESC, gram LIMIT {semistructured._BIGRAM_TOPK}""",
    ),
    "arrow_map_profile": QuerySpec(
        semistructured.q_arrow_map_profile,
        """SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
  CAST(SUM(strlen(text)) AS BIGINT) AS sum_bytes,
  CAST(MAX(length(text)) AS BIGINT) AS max_chars
FROM documents GROUP BY 1 ORDER BY 1""",
    ),
    "xml_shred_gate": QuerySpec(
        semistructured.q_xml_shred_gate,
        """SELECT o_orderstatus AS status, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_total,
  COUNT(DISTINCT year(o_orderdate) * 100 + month(o_orderdate)) AS n_year_months
FROM orders GROUP BY 1 ORDER BY 1""",
    ),
    "statestore_read_gate": QuerySpec(
        _faces.q_statestore_read_gate,
        """SELECT COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
FROM events""",
    ),
    "python_datasource_gate": QuerySpec(
        semistructured.q_python_datasource_gate,
        """SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars, MIN(doc_id) AS min_doc
FROM documents WHERE n_chars > 300 GROUP BY 1 ORDER BY 1""",
    ),
    "python_cdc_stream_gate": QuerySpec(
        _faces.q_python_cdc_stream_gate,
        """SELECT event_type, COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value,
  MAX(epoch_us(ts)) AS max_ts_us
FROM events GROUP BY 1 ORDER BY 1""",
    ),
}

assert len(STAGED_QUERIES_R12) == 11, len(STAGED_QUERIES_R12)
# name-collision guards against the live registry run at registration time
# (registry.py's ROUND-12 block) -- asserting against registry.QUERIES here
# would re-create the import cycle the leaf-import discipline removes

"""Round-16 STAGED batch: the composed curation-funnel gates.

The LLM-data stages (language gating, quality heuristics, exact and
near dedup, token accounting) are individually driver-proven; these two
gates prove their COMPOSITION -- the five-stage funnel with per-stage
attributable loss, and funnel idempotence under incremental processing
(new-batch-only stages + keep-min reconciliation against the published
survivor index, displacement included). See ``analytics/funnel.py``.

Same staging discipline as registry_r11..r15: mirrors the live
``QUERIES`` contract, promoted by ``QUERIES.update(STAGED_QUERIES_R16)``
in a later round, never driver-visible before then. Verified by
tests/test_r16_staged.py through the driver-identical comparison; the
oracle bind-type lint covers this batch pre-registration
(tests/test_oracle_types.py).

LEAF imports only (spec.py, not registry) -- the import-order rule
every staged registry follows since the spec.py split.
"""

from __future__ import annotations

from pgsf_spark.analytics import funnel
from pgsf_spark.analytics.spec import _NORM, QuerySpec

_LANG_LIST = ", ".join(f"'{lang}'" for lang in funnel.FUNNEL_LANGS)

# The funnel's CTE chain, shared by both oracles: ingest with the
# duplicate wave -> featurize -> lang -> quality -> exact keep-min ->
# prefix keep-min. Every constant comes from funnel.py.
_FUNNEL_CTES = f"""WITH ing AS (
  SELECT doc_id, text, lang, source FROM documents
  UNION ALL
  SELECT doc_id + {funnel.DUP_OFFSET}, text, lang, source
  FROM documents WHERE doc_id % {funnel.DUP_MOD} = 0),
f AS (
  SELECT doc_id, lang, source, norm, len(toks) AS n_tok,
    length(replace(norm, ' ', '')) / len(toks) AS mwl,
    len(list_filter(toks, x -> length(x) <= 3)) / len(toks) AS sr
  FROM (SELECT doc_id, lang, source, norm, string_split(norm, ' ') AS toks
        FROM (SELECT doc_id, lang, source, {_NORM} AS norm FROM ing))),
l AS (SELECT * FROM f WHERE lang IN ({_LANG_LIST})),
q AS (SELECT * FROM l
      WHERE n_tok >= {funnel.MIN_TOKENS} AND mwl >= {funnel.MWL_LO}
        AND mwl <= {funnel.MWL_HI} AND sr <= {funnel.SHORT_RATIO_MAX}),
e AS (SELECT * FROM (
        SELECT *, MIN(doc_id) OVER (PARTITION BY md5(norm)) AS k FROM q)
      WHERE doc_id = k),
p AS (SELECT * FROM (
        SELECT *, MIN(doc_id) OVER (
          PARTITION BY md5(substr(norm, 1, {funnel.PREFIX_K}))) AS k2 FROM e)
      WHERE doc_id = k2)"""

STAGED_QUERIES_R16: dict[str, QuerySpec] = {
    "curation_funnel_gate": QuerySpec(
        funnel.q_curation_funnel_gate,
        f"""{_FUNNEL_CTES},
st AS (
  SELECT 0 AS stage_idx, 'ingest' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_tok) AS BIGINT) AS sum_tokens FROM f
  UNION ALL SELECT 1, 'lang_filter', COUNT(*), CAST(SUM(n_tok) AS BIGINT) FROM l
  UNION ALL SELECT 2, 'quality_filter', COUNT(*), CAST(SUM(n_tok) AS BIGINT) FROM q
  UNION ALL SELECT 3, 'exact_dedup', COUNT(*), CAST(SUM(n_tok) AS BIGINT) FROM e
  UNION ALL SELECT 4, 'prefix_dedup', COUNT(*), CAST(SUM(n_tok) AS BIGINT) FROM p)
SELECT CAST(stage_idx AS INT) AS stage_idx, stage, n_docs, sum_tokens,
  CAST(COALESCE(LAG(n_docs) OVER (ORDER BY stage_idx) - n_docs, 0) AS BIGINT)
    AS n_dropped
FROM st ORDER BY stage_idx""",
    ),
    # the oracle restates the FULL recompute; the Spark face computes the
    # INCREMENTAL path and asserts set equality in-gate, so a divergence
    # fails twice (loud in-gate, hash-red at the driver)
    "curation_funnel_incremental_gate": QuerySpec(
        funnel.q_curation_funnel_incremental_gate,
        f"""{_FUNNEL_CTES}
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tok) AS BIGINT) AS sum_tokens, MIN(doc_id) AS min_doc
FROM p GROUP BY source ORDER BY source""",
    ),
}

assert len(STAGED_QUERIES_R16) == 2, len(STAGED_QUERIES_R16)

"""Extension wave 10 — round 9:

- d20: cross-document exact-substring REMOVAL (the Lee-et-al dedup
  TRANSFORM — d17 measures the duplicated-window rate, t17 removes
  within-doc spans; this one excises cross-doc duplicated spans and
  reassembles the survivors, audited with bounded per-doc aggregates)
- m11: perceptual image near-dup via integer 8×8 DCT pHash (upgrades
  m10's aHash — same parsed-PPM payloads, same hamming band machinery)
- o18: quota-exact temperature-scaled source mixing (largest-remainder
  integer quotas + deterministic Efraimidis–Spirakis selection)
- t23: BPE corpus encoding under a literal merge table (greedy
  leftmost-lowest-rank application; bounded per-doc audit)

Importing this module REGISTERS its queries (oracle SQL inline);
plans/queries.py imports it after q_extensions7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ._registry import QUERIES, _ctx, _register

# ---------------------------------------------------------------------------
# d20: cross-document exact-substring removal (the dedup transform)
# ---------------------------------------------------------------------------

_D20_K = 8


@_register(
    "d20_crossdoc_span_removal",
    f"""
    WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+')
                         AS w
                  FROM documents),
    tok AS (SELECT doc_id, i AS q, w[i] AS tok
            FROM toks, range(1, 4096) t(i) WHERE i <= len(w)),
    occ AS (SELECT doc_id, i AS p,
                   array_to_string(w[i : i + {_D20_K - 1}], ' ') AS gram
            FROM toks, range(1, 4096) t(i) WHERE i + {_D20_K - 1} <= len(w)),
    mins AS (SELECT gram, min(doc_id) AS min_doc FROM occ GROUP BY gram),
    fl AS (SELECT DISTINCT o.doc_id, o.p
           FROM occ o JOIN mins m USING (gram) WHERE m.min_doc < o.doc_id),
    st AS (SELECT t.doc_id, t.q, t.tok,
                  CASE WHEN f.p IS NULL THEN 0 ELSE 1 END AS start_flag
           FROM tok t LEFT JOIN fl f ON f.doc_id = t.doc_id AND f.p = t.q),
    cov AS (SELECT doc_id, q, tok,
                   max(start_flag) OVER (PARTITION BY doc_id ORDER BY q
                     ROWS BETWEEN {_D20_K - 1} PRECEDING AND CURRENT ROW)
                     AS covered
            FROM st),
    cov2 AS (SELECT doc_id, tok, covered,
                    sum(1 - covered) OVER (PARTITION BY doc_id ORDER BY q
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS rn_kept
             FROM cov)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(covered) AS BIGINT) AS n_removed,
           CAST(sum(1 - covered) AS BIGINT) AS n_kept,
           CASE WHEN sum(1 - covered) > 0 THEN
             CAST(sum(CASE WHEN covered = 0 THEN length(tok) END)
                  + sum(1 - covered) - 1 AS BIGINT) END AS kept_len,
           CASE WHEN sum(1 - covered) > 0 THEN
             CAST(sum(CASE WHEN covered = 0 THEN rn_kept
                    * ('0x' || substr(md5(tok), 1, 8))::BIGINT END)
                  AS BIGINT) END AS kept_sig
    FROM cov2 GROUP BY doc_id
    """,
    survey="north-star dedup completion: cross-document exact-substring "
    "REMOVAL — the actual Lee-et-al transform (d17 is the detector, t17 "
    "the within-doc cousin): every 8-token window whose gram occurs in "
    "a smaller doc_id is excised from the later doc and survivors are "
    "reassembled in order; first-occurrence-wins is deterministic "
    "(corpus-min doc_id keeps all its occurrences). Audit columns are "
    "pure bounded per-doc aggregates (n_tokens/n_removed/n_kept, "
    "derived reassembly length, position-weighted survivor signature — "
    "the d10/t17 oracle discipline, no reassembled text materialized). "
    "Plan: row-local gram assembly, min-doc-per-gram as ONE window "
    "exchange on gram (no self-join — a gram in m docs costs m rows, "
    "never m²), flagged starts equi-join back to the token relation, "
    "one per-doc sort window for trailing-k coverage + running kept "
    "index, map-side-combining rollup. O(tokens + windows) at any "
    "corpus size; gram_key='xxhash64' is the production wire knob "
    "(8-byte gram keys, collisions only ever over-remove).",
)
def d20_crossdoc_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc audit of cross-document duplicated-span excision +
    survivor reassembly (see functions.dedup.crossdoc_span_removal)."""
    from ..functions.dedup import crossdoc_span_removal

    (docs,) = _ctx(spark, sf_dir, "documents")
    return crossdoc_span_removal(docs, k=_D20_K, gram_key="raw")

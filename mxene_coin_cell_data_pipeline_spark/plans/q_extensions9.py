"""Extension wave 11 — round 10:

- s13: PQ asymmetric-distance (ADC) top-k retrieval — the SEARCH stage
  completing s11's code-assignment map stage (compressed ANN end to
  end), with dual recall audits vs the exact-L2 and exact-cosine
  rankings
- m12: video-level near-dup via keyframe pHash composition (m09's
  scene-cut keyframing over real AVI containers of real PPM frames +
  m11's fixed-point DCT pHash + the shared star-capped hamming band
  machinery, aggregated to a bounded per-video-pair audit)
- t24: iterative BPE merge TRAINING (t19 unrolled — select the max
  adjacent-pair merge, apply it to the vocabulary, recount; emits the
  rank-ordered merge table t23-style encoding consumes)
- p06: the wave-10 capstone chain (d20 span removal → o18 quota
  mixing → o15 packing-style accounting → t23 encoding) as ONE lazy
  audited plan

Importing this module REGISTERS its queries (oracle SQL inline);
plans/queries.py imports it after q_extensions8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ._registry import QUERIES, _ctx, _register

# ---------------------------------------------------------------------------
# s13: PQ ADC top-k retrieval (the compressed-ANN search stage)
# ---------------------------------------------------------------------------

_S13_M, _S13_K, _S13_TOPK = 4, 4, 10

#: s11's code-assignment CTE fragment (verbatim semantics: per-subspace
#: expanded squared distance, ties to the smaller code), pivoted to one
#: row per vector — the query vector itself (vec_id 0) excluded from
#: the searched corpus.
_S13_CODES_CTES = """
    e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    cent AS (SELECT vec_id AS code, e AS c FROM e WHERE vec_id < 4),
    q AS (SELECT e AS qv FROM e WHERE vec_id = 0),
    d AS (
      SELECT e.vec_id, s.s, cent.code,
             list_dot_product(e.e[s.s*16+1 : s.s*16+16],
                              e.e[s.s*16+1 : s.s*16+16])
             - 2 * list_dot_product(e.e[s.s*16+1 : s.s*16+16],
                                    cent.c[s.s*16+1 : s.s*16+16])
             + list_dot_product(cent.c[s.s*16+1 : s.s*16+16],
                                cent.c[s.s*16+1 : s.s*16+16]) AS dist
      FROM e, (SELECT unnest(generate_series(0, 3)) AS s) s, cent
      WHERE e.vec_id <> 0),
    a AS (SELECT vec_id, s, code,
                 row_number() OVER (PARTITION BY vec_id, s
                                    ORDER BY dist, code) AS rn
          FROM d),
    codes AS (SELECT vec_id,
                     max(CASE WHEN s = 0 THEN code END) AS c0,
                     max(CASE WHEN s = 1 THEN code END) AS c1,
                     max(CASE WHEN s = 2 THEN code END) AS c2,
                     max(CASE WHEN s = 3 THEN code END) AS c3
              FROM a WHERE rn = 1 GROUP BY vec_id),
    lut AS (SELECT s.s, cent.code,
                   list_dot_product(q.qv[s.s*16+1 : s.s*16+16],
                                    q.qv[s.s*16+1 : s.s*16+16])
                   - 2 * list_dot_product(q.qv[s.s*16+1 : s.s*16+16],
                                          cent.c[s.s*16+1 : s.s*16+16])
                   + list_dot_product(cent.c[s.s*16+1 : s.s*16+16],
                                      cent.c[s.s*16+1 : s.s*16+16]) AS ld
            FROM q, (SELECT unnest(generate_series(0, 3)) AS s) s, cent)
"""

_S13_LUTP = ",\n                 ".join(
    f"max(CASE WHEN s = {s} AND code = {c} THEN ld END) AS l{s}_{c}"
    for s in range(_S13_M)
    for c in range(_S13_K)
)
# the 4-term ADC sum, parenthesized terms added left to right —
# mirrors the Spark t0+t1+t2+t3 fold exactly
_S13_ADC = " + ".join(
    "(CASE v.c%d %s ELSE l.l%d_%d END)"
    % (
        s,
        " ".join(f"WHEN {c} THEN l.l{s}_{c}" for c in range(_S13_K - 1)),
        s,
        _S13_K - 1,
    )
    for s in range(_S13_M)
)


@_register(
    "s13_pq_adc_topk",
    f"""
    WITH {_S13_CODES_CTES.strip()},
    lutp AS (SELECT {_S13_LUTP}
             FROM lut),
    adc AS (SELECT v.vec_id,
                   CAST(round(({_S13_ADC}) * 1e9) AS BIGINT) AS adc_nanos
            FROM codes v, lutp l),
    exact AS (SELECT e.vec_id,
                     CAST(round((list_dot_product(e.e, e.e)
                          - 2 * list_dot_product(e.e, q.qv)
                          + list_dot_product(q.qv, q.qv)) * 1e9) AS BIGINT)
                       AS l2_nanos,
                     list_dot_product(e.e, q.qv)
                       / (sqrt(list_dot_product(e.e, e.e))
                          * sqrt(list_dot_product(q.qv, q.qv))) AS cosf
              FROM e, q WHERE e.vec_id <> 0),
    l2top AS (SELECT vec_id FROM exact ORDER BY l2_nanos, vec_id LIMIT 10),
    costop AS (SELECT vec_id FROM exact ORDER BY cosf DESC, vec_id LIMIT 10)
    SELECT t.vec_id, t.adc_nanos,
           CASE WHEN t.vec_id IN (SELECT vec_id FROM l2top)
                THEN 1 ELSE 0 END AS in_exact_l2_topk,
           CASE WHEN t.vec_id IN (SELECT vec_id FROM costop)
                THEN 1 ELSE 0 END AS in_exact_cos_topk
    FROM (SELECT vec_id, adc_nanos FROM adc
          ORDER BY adc_nanos, vec_id LIMIT {_S13_TOPK}) t
    """,
    survey="north-star similarity completion: PQ asymmetric-distance "
    "(ADC) top-k retrieval — the SEARCH stage s11's code assignment "
    "was half of (Jégou et al., TPAMI 2011 §IV.A). A per-query lookup "
    "table lut[s][c] = ||q_s − centroid_{{s,c}}||² (m·k doubles, "
    "computed driver-side from the collected seeds + query and inlined "
    "as literals) turns every database vector's approximate distance "
    "into m element_at lookups over its code bytes plus 3 adds — a "
    "pure scan over the compressed codes, no vector arithmetic per "
    "row, then TakeOrdered top-k pushdown. Dual recall audit in-query "
    "(the s09 discipline): membership flags vs the exact squared-L2 "
    "top-k (the metric ADC approximates — isolates quantization loss; "
    "sum = recall@k·k) AND vs the exact cosine top-k (brackets metric "
    "mismatch). Exact rankings order on the round(·1e9) int64 grid "
    "with vec_id tie-breaks; every float fold is sequential "
    "left-to-right on both engines.",
    note="Plan pin (tests/test_plan_shapes.py): no join wider than the "
    "10-row membership broadcasts, TakeOrderedAndProject present, "
    "codes derived by the s11 pure-scan assignment.",
)
def s13_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-10 through the PQ codes with exact-L2 / exact-cosine
    recall flags (see functions.similarity.pq_adc_topk)."""
    from ..functions.similarity import pq_adc_topk

    (emb,) = _ctx(spark, sf_dir, "embeddings")
    return pq_adc_topk(
        emb, query_vec_id=0, m=_S13_M, k=_S13_K, topk=_S13_TOPK
    )

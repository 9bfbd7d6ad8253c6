"""Extension wave 10 — round 9:

- d20: cross-document exact-substring REMOVAL (the Lee-et-al dedup
  TRANSFORM — d17 measures the duplicated-window rate, t17 removes
  within-doc spans; this one excises cross-doc duplicated spans and
  reassembles the survivors, audited with bounded per-doc aggregates)
- m11: perceptual image near-dup via integer 8×8 DCT pHash (upgrades
  m10's aHash — same parsed-PPM payloads, same hamming band machinery)
- o18: quota-exact temperature-scaled source mixing (largest-remainder
  integer quotas + deterministic md5-ranked selection — the o06
  machinery under broadcast per-source quotas; unweighted WITHIN a
  source, the temperature policy lives entirely in the quota)
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

#: the span-removal derivation as a reusable CTE block (toks ... cov2:
#: token relation with covered flag + running kept index) — consumed by
#: d20's registered audit below AND p06's capstone chain
#: (q_extensions9), which keeps processing the surviving tokens.
_D20_CTES = f"""toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+')
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
             FROM cov)"""


@_register(
    "d20_crossdoc_span_removal",
    f"""
    WITH {_D20_CTES}
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
    UNION ALL
    -- poison sentinel (the d06 discipline): the unnest above caps each
    -- doc at 4095 tokens while the Spark engine is uncapped; a corpus
    -- with a longer doc must FAIL the driver hash loudly, not diverge
    -- silently.
    SELECT CAST(-1 AS BIGINT) AS doc_id, CAST(mx AS BIGINT) AS n_tokens,
           CAST(NULL AS BIGINT) AS n_removed, CAST(NULL AS BIGINT) AS n_kept,
           CAST(NULL AS BIGINT) AS kept_len, CAST(NULL AS BIGINT) AS kept_sig
    FROM (SELECT max(len(w)) AS mx FROM toks) WHERE mx >= 4096
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


# ---------------------------------------------------------------------------
# m11: perceptual image near-dup via integer 8x8 DCT pHash
# ---------------------------------------------------------------------------

from ..functions.multimodal import COS14  # noqa: E402
from .q_dedup_pairs import _d13_oracle  # noqa: E402
from .q_extensions7 import _PPM_CELLS_CTES  # noqa: E402

#: unrolled separable DCT as pure per-doc scalar expressions,
#: generated from the SAME hardcoded COS14 literal the Arrow kernel
#: uses so the two engines cannot disagree on a single coefficient.
#: WHY unrolled, not a cos-table join: the first m11 100× attempt
#: joined a 64-row basis relation against the 32M-row cell relation
#: twice (rows then columns) — ~0.5e9 intermediate rows per pass, and
#: DuckDB spilled its way into disk exhaustion beside the corpus
#: (measured, sweep record kept). The separable transform over a
#: per-doc 64-element list needs NO join at all: 64 row-pass
#: expressions of 8 terms, 64 column-pass expressions of 8 terms,
#: evaluated streaming over 500k pivoted rows.
_ROWT_COLS = ",\n             ".join(
    f"({' + '.join(f'l[{r * 8 + x + 1}] * ({COS14[v][x]})' for x in range(8))})"
    f" AS r{r}v{v}"
    for r in range(8)
    for v in range(8)
)
_COLT_COLS = ",\n             ".join(
    f"({' + '.join(f'({COS14[u][r]}) * r{r}v{v}' for r in range(8))})"
    f" AS d{u}_{v}"
    for u in range(8)
    for v in range(8)
)
_SAC_EXPR = " + ".join(
    f"d{u}_{v}" for u in range(8) for v in range(8) if (u, v) != (0, 0)
)
_BITS_EXPR = " || ".join(
    "'0'"
    if (u, v) == (0, 0)
    else f"(CASE WHEN 63 * d{u}_{v} > s THEN '1' ELSE '0' END)"
    for u in range(8)
    for v in range(8)
)

#: (doc_id, simhash_bits) derivation of the image DCT pHash from the
#: md5 sample stream: the shared m10 cell CTEs produce the 8×8 NN luma
#: grid (pivoted to one 64-element list per doc), then the unrolled
#: fixed-point DCT-II above and bit (u,v) = 63·D[u][v] > Σ AC with the
#: DC bit fixed 0. Aliased simhash_bits for the shared d09 band/refine
#: template.
_M11_BITS_SQL = f"""
    SELECT bb.doc_id, bb.b AS simhash_bits FROM (
      {_PPM_CELLS_CTES},
      grid AS (SELECT doc_id, list(luma ORDER BY r, c) AS l
               FROM cells GROUP BY doc_id),
      rowt AS (SELECT doc_id,
             {_ROWT_COLS}
               FROM grid),
      colt AS (SELECT doc_id,
             {_COLT_COLS}
               FROM rowt),
      sc AS (SELECT doc_id, ({_SAC_EXPR}) AS s, * FROM colt)
      SELECT doc_id, ({_BITS_EXPR}) AS b FROM sc) bb
"""


@_register(
    "m11_image_phash_neardup",
    None,  # assigned below via the shared d09 band/refine template
    survey="north-star multimodal completion: perceptual image near-dup "
    "at production quality — 64-bit DCT pHash (the fingerprint family "
    "aHash is the weak cousin of): same genuinely parsed PPM payloads "
    "and 8×8 NN integer-luma grid as m10, then a separable FIXED-POINT "
    "integer 8×8 DCT-II (hardcoded 2^14-scaled basis shared verbatim "
    "between the Arrow kernel and the generated oracle SQL) and bit "
    "(u,v) = 63·coef > Σ AC with the DC bit pinned 0 — so global "
    "brightness, exactly what a perceptual hash must ignore, never "
    "touches the fingerprint, and localized pixel noise spreads across "
    "basis responses instead of flipping cells one-for-one (robustness "
    "fixture: a 3-sample perturbation that flips aHash past its "
    "hamming gate leaves pHash inside it). Fingerprints feed the SAME "
    "hamming_pairs_from_bits band join as d09/d13/m10.",
    note="REGISTERED CAPPED from birth (bucket_cap=64) — m10's lesson: "
    "perceptual bands on small images are low-entropy and the uncapped "
    "band join is the quadratic trap the star cap exists for.",
)
def m11_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DCT-pHash fingerprints of sibling-pair PPM images -> hamming ≤ 3
    pairs via the pigeonhole band join (star-capped)."""
    from ..functions.dedup import hamming_pairs_from_bits
    from ..functions.multimodal import phash_bits, with_ppm_pair_payload
    from ..sources.tables import scale_out

    (docs,) = _ctx(spark, sf_dir, "documents")
    # scale_out for the same reason as m10: the kernel re-derives ~60
    # ASCII int parses per image and feeds a join — single-row-group
    # layouts would run it as ONE task
    fps = phash_bits(
        with_ppm_pair_payload(scale_out(docs.select("doc_id"), "doc_id"))
    )
    return hamming_pairs_from_bits(
        fps, bits_col="phash_bits", bits=64, max_hamming=3, n_bands=4,
        bucket_cap=64,
    )


QUERIES["m11_image_phash_neardup"].oracle = _d13_oracle(
    bits=64, n_bands=4, cap=64, sh_sql=_M11_BITS_SQL
)


# ---------------------------------------------------------------------------
# o18: quota-exact temperature-scaled source mixing
# ---------------------------------------------------------------------------

#: skewed source carve (shares 8/4/2/1/1 of 16) so sqrt-temperature
#: rebalancing is non-trivial: the big source is down-weighted
#: relative to its share, the tail sources up-weighted
_O18_SRC_SQL = """CASE WHEN doc_id % 16 < 8 THEN 0
             WHEN doc_id % 16 < 12 THEN 1
             WHEN doc_id % 16 < 14 THEN 2
             WHEN doc_id % 16 < 15 THEN 3
             ELSE 4 END"""


@_register(
    "o18_source_mix_quota",
    f"""
    WITH rows_ AS (SELECT doc_id AS k, {_O18_SRC_SQL} AS source
                   FROM documents),
    counts AS (SELECT source, count(*) AS n_source FROM rows_
               GROUP BY source),
    w AS (SELECT source, CAST(n_source AS BIGINT) AS n_source,
                 CAST(floor(sqrt(CAST(n_source AS DOUBLE))) AS BIGINT) AS w
          FROM counts),
    tot AS (SELECT CAST(sum(n_source) AS BIGINT) AS N,
                   CAST(sum(w) AS BIGINT) AS S FROM w),
    q0 AS (SELECT w.source, w.n_source, w.w, (t.N // 5) AS B,
                  ((t.N // 5) * w.w) // t.S AS base,
                  ((t.N // 5) * w.w) % t.S AS rem
           FROM w CROSS JOIN tot t),
    q AS (SELECT source, n_source, w,
                 base + CASE WHEN row_number()
                                  OVER (ORDER BY rem DESC, source)
                             <= B - CAST(sum(base) OVER () AS BIGINT)
                        THEN 1 ELSE 0 END AS quota
          FROM q0),
    rk AS (SELECT r.source, r.k,
                  row_number() OVER (PARTITION BY r.source
                    ORDER BY md5(CAST(r.k AS VARCHAR)), r.k) AS rank
           FROM rows_ r),
    sel AS (SELECT rk.source, rk.rank, rk.k
            FROM rk JOIN q USING (source) WHERE rk.rank <= q.quota)
    SELECT q.source, q.n_source, q.w, q.quota,
           CAST(count(*) AS BIGINT) AS n_selected,
           CAST(sum(sel.rank
                * ('0x' || substr(md5(CAST(sel.k AS VARCHAR)), 1, 8))::BIGINT)
                AS BIGINT) AS sel_sig
    FROM sel JOIN q USING (source)
    GROUP BY q.source, q.n_source, q.w, q.quota
    """,
    survey="north-star sampling completion: quota-EXACT temperature-"
    "scaled source mixing — the training-mix epoch plan (sample N/5 "
    "rows at temperature 1/2 across skewed sources). Integer-only "
    "allocation (w=floor(sqrt(n)), base=(B·w) DIV S, largest-remainder "
    "completion) so Σ quota == B is an identity on both engines — no "
    "float-boundary risk anywhere in the quota math; selection is the "
    "o06 md5-ranked deterministic machinery with per-source quotas "
    "broadcast onto the row relation. Output is a bounded per-source "
    "audit (n_source, w, quota, n_selected, position-weighted "
    "selection signature). Completes o06 (fixed n per stratum) and "
    "o08 (per-row weights): a source-LEVEL policy hitting an exact "
    "global budget.",
)
def o18_source_mix_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-1/2 mixture over the 5 skewed sources with exact
    integer quotas summing to N DIV 5 (see
    functions.sampling.source_mix_quota)."""
    from ..functions.sampling import source_mix_quota

    (docs,) = _ctx(spark, sf_dir, "documents")
    m = F.col("doc_id") % 16
    src = (
        F.when(m < 8, 0)
        .when(m < 12, 1)
        .when(m < 14, 2)
        .when(m < 15, 3)
        .otherwise(4)
    )
    return source_mix_quota(
        docs, src, key="doc_id", budget_den=5, weighting="sqrt"
    )


# ---------------------------------------------------------------------------
# t23: corpus BPE encoding under the literal merge table
# ---------------------------------------------------------------------------

from ..functions.text import BPE_MERGES  # noqa: E402

#: the oracle's merge loop, generated from the SAME literal merge
#: table the Arrow kernel applies: a DuckDB RECURSIVE CTE advances
#: each distinct word one merge per step (leftmost occurrence of the
#: lowest applicable rank — p{k} probes are evaluated in rank order by
#: the CASE), terminating on words with no applicable merge. The
#: recursion runs over the DISTINCT vocabulary only (Heaps-law small),
#: exactly mirroring the engine's vocab-cached kernel.
_T23_POS = ",\n             ".join(
    f"coalesce(list_filter(range(1, len(syms)), i -> syms[i] = '{a}' "
    f"AND syms[i+1] = '{b}')[1], 0) AS p{k}"
    for k, (a, b) in enumerate(BPE_MERGES)
)
_T23_APPLY = "\n          ".join(
    f"WHEN p{k} > 0 THEN list_slice(syms, 1, p{k}-1) || ['{a}{b}'] "
    f"|| list_slice(syms, p{k}+2, len(syms))"
    for k, (a, b) in enumerate(BPE_MERGES)
)
_T23_ANY = " OR ".join(f"p{k} > 0" for k in range(len(BPE_MERGES)))
_T23_NONE = " AND ".join(f"p{k} = 0" for k in range(len(BPE_MERGES)))


@_register(
    "t23_bpe_encode",
    f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
      FROM documents),
    occ AS (SELECT doc_id, i AS widx, w[i] AS tok
            FROM toks, range(1, 4096) t(i) WHERE i <= len(w)),
    vocab AS (SELECT DISTINCT tok FROM occ),
    enc AS (
      SELECT tok, list_transform(range(1, len(tok) + 1), i -> tok[i])
               AS syms
      FROM vocab
      UNION ALL
      SELECT tok, CASE
          {_T23_APPLY}
        END AS syms
      FROM (SELECT tok, syms,
             {_T23_POS}
            FROM enc) WHERE {_T23_ANY}
    ),
    final AS (
      SELECT tok, array_to_string(syms, '|') AS e, len(syms) AS n_syms
      FROM (SELECT tok, syms,
             {_T23_POS}
            FROM enc)
      WHERE {_T23_NONE})
    SELECT occ.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(occ.tok)) AS BIGINT) AS n_chars,
           CAST(sum(f.n_syms) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(occ.widx
                * ('0x' || substr(md5(f.e), 1, 8))::BIGINT) AS BIGINT)
             AS bpe_sig
    FROM occ JOIN final f ON f.tok = occ.tok
    GROUP BY occ.doc_id
    UNION ALL
    -- poison sentinel: occ caps each doc at 4095 tokens (range bound
    -- must be a constant in DuckDB); a longer doc fails loudly here
    -- instead of silently dropping words from the oracle only.
    SELECT CAST(-1 AS BIGINT) AS doc_id, CAST(mx AS BIGINT) AS n_words,
           CAST(NULL AS BIGINT) AS n_chars,
           CAST(NULL AS BIGINT) AS n_bpe_tokens,
           CAST(NULL AS BIGINT) AS bpe_sig
    FROM (SELECT max(len(w)) AS mx FROM toks) WHERE mx >= 4096
    """,
    survey="north-star text completion: corpus BPE ENCODING under a "
    "literal rank-ordered merge table (the trained-tokenizer artifact "
    "— the stage t15 pre-tokenization and t19 merge training lead up "
    "to). Single-step-leftmost-minrank semantics shared by three "
    "implementations: the Arrow kernel (bpe_apply_merges, run once "
    "per DISTINCT word — the fast-tokenizer word cache distributed: "
    "O(vocab) Python, O(tokens) JVM join + map-side rollup), a pure-"
    "Python differential (pytest), and a DuckDB RECURSIVE-CTE oracle "
    "that advances each vocab word one merge per step — the merge "
    "LOOP defeats single-pass SQL but not recursion, so the audit "
    "stays fully oracle-backed instead of rows-only. Bounded per-doc "
    "audit: n_words/n_chars/n_bpe_tokens (the compression ratio) + "
    "position-weighted encoding signature. Merge table includes "
    "chained merges (s,c→sc,a→sca,n) so application order is "
    "load-bearing.",
)
def t23_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BPE-encoding audit under the literal BPE_MERGES table
    (see functions.text.bpe_encode_corpus)."""
    from ..functions.text import bpe_encode_corpus

    (docs,) = _ctx(spark, sf_dir, "documents")
    return bpe_encode_corpus(docs)

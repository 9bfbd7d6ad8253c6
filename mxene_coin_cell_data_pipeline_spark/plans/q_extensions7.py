"""Extension wave 8 — round 8c:

- m09: AVI keyframe / scene-cut detection (frame-pair byte diffs from
  the genuinely parsed RIFF container)
- d19: near-containment pairs (doc-inside-doc detection — the
  asymmetric score jaccard/LSH structurally miss)
- src06: parquet schema-evolution read (mergeSchema over two written
  generations)

Importing this module REGISTERS its queries (oracle SQL inline);
plans/queries.py imports it after q_extensions6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ._registry import QUERIES, _ctx, _register

# ---------------------------------------------------------------------------
# m09: AVI keyframe detection
# ---------------------------------------------------------------------------


@_register(
    "m09_avi_keyframes",
    """
    WITH d AS (SELECT doc_id, 2 + doc_id % 4 AS nf FROM documents),
    fr AS (SELECT d.doc_id, u.k, 4 + (d.doc_id + u.k) % 5 AS m
           FROM d, LATERAL (SELECT unnest(generate_series(0, d.nf - 1))
                            AS k) u),
    pr AS (SELECT c.doc_id, c.k, p.m AS m_prev, c.m AS m_cur
           FROM fr c JOIN fr p ON p.doc_id = c.doc_id AND p.k = c.k - 1),
    diffs AS (
      SELECT pr.doc_id, pr.k, pr.m_prev, pr.m_cur,
             sum(abs(
               ('0x' || substr(md5(CAST(pr.doc_id AS VARCHAR) || ':'
                    || CAST(pr.k AS VARCHAR) || ':'
                    || CAST(j.j AS VARCHAR)), 1, 2))::BIGINT
               - ('0x' || substr(md5(CAST(pr.doc_id AS VARCHAR) || ':'
                    || CAST(pr.k - 1 AS VARCHAR) || ':'
                    || CAST(j.j AS VARCHAR)), 1, 2))::BIGINT)) AS diff_sum
      FROM pr, LATERAL (SELECT unnest(generate_series(0,
               least(pr.m_prev, pr.m_cur) - 1)) AS j) j
      GROUP BY 1, 2, 3, 4)
    SELECT doc_id,
           CAST(k AS INT) AS frame_idx,
           CAST(m_prev AS INT) AS prev_bytes,
           CAST(m_cur AS INT) AS frame_bytes,
           CAST(diff_sum AS BIGINT) AS diff_sum,
           CASE WHEN 2 * diff_sum >= 255 * least(m_prev, m_cur)
                THEN 1 ELSE 0 END AS is_key
    FROM diffs
    """,
    survey="north-star multimodal completion: keyframe / scene-cut "
    "detection over the REAL RIFF/AVI chunk walk — per consecutive "
    "movi frame pair, the integer sum of absolute byte differences "
    "over the overlapping prefix and the exact integer keyframe "
    "predicate 2·diff ≥ 255·min(len) (mean diff ≥ half the byte "
    "range; no float thresholds). The frame-sampling policy video "
    "curation ships (keep cuts, drop near-static frames), computed "
    "inside the same Arrow mapInPandas kernel as the parse so no "
    "exploded frame table and no window shuffle ever exist; the "
    "oracle re-derives every byte of both frames from the md5 movi "
    "stream. m03/m08's sampling legs pick frames by position — this "
    "one picks them by CONTENT.",
)
def m09_avi_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-pair byte diffs + integer keyframe flags from genuinely
    parsed per-doc AVI containers."""
    from ..functions.multimodal import avi_keyframes, with_avi_payload

    (docs,) = _ctx(spark, sf_dir, "documents")
    return avi_keyframes(with_avi_payload(docs.select("doc_id")))


# ---------------------------------------------------------------------------
# d19: near-containment pairs
# ---------------------------------------------------------------------------


@_register(
    "d19_containment_pairs",
    """
    WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+')
                         AS w
                  FROM documents),
    sh AS MATERIALIZED (
       SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
       FROM toks, range(1, 4096) t(i) WHERE i + 2 <= len(w)),
    cap AS MATERIALIZED (
       SELECT doc_id, shingle FROM (
         SELECT doc_id, shingle,
                count(*) OVER (PARTITION BY shingle) AS df
         FROM sh) WHERE df <= 64),
    sizes AS (SELECT doc_id, count(*) AS n FROM cap GROUP BY doc_id),
    d1 AS (SELECT doc_id, shingle,
                  count(*) OVER (PARTITION BY shingle) AS df
           FROM cap),
    d2 AS (SELECT d1.doc_id, d1.shingle, z.n,
                  row_number() OVER (PARTITION BY d1.doc_id
                                     ORDER BY d1.df, d1.shingle) AS rn
           FROM d1 JOIN sizes z USING (doc_id)),
    pref AS (SELECT doc_id, n, rn, shingle FROM d2
             WHERE rn <= n - ceil(0.9 * n) + 1
               AND n - rn + 1 >= ceil(0.9 * n)),
    cand AS (SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_a,
                             greatest(a.doc_id, b.doc_id) AS doc_b
             FROM pref a JOIN d2 b ON a.shingle = b.shingle
                                   AND a.doc_id <> b.doc_id
             WHERE a.n <= b.n),
    inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
              FROM cand c
              JOIN cap sa ON sa.doc_id = c.doc_a
              JOIN cap sb ON sb.doc_id = c.doc_b
                          AND sb.shingle = sa.shingle
              GROUP BY 1, 2)
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_inter AS BIGINT) AS n_inter,
           i.n_inter * 1.0 / least(na.n, nb.n) AS containment
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE i.n_inter * 1.0 / least(na.n, nb.n) >= 0.9
    """,
    survey="north-star dedup completion: near-CONTAINMENT pairs "
    "|A∩B|/min(|A|,|B|) ≥ 0.9 over the df≤64 stop-filtered shingle "
    "universe — the doc-inside-doc signal (quotes, aggregators, "
    "chunk-of-a-doc) that jaccard structurally misses (a small doc "
    "embedded in a huge one has jaccard ≈ |A|/|B| → 0) and that "
    "MinHash-LSH, a jaccard estimator, cannot surface. Candidate "
    "prune: the AllPairs prefix theorem specialized to the asymmetric "
    "score — only the SMALLER side's rarest-first prefix joins, "
    "against the larger side's full capped postings (containment has "
    "no length filter by definition, which is why the df cap is part "
    "of the REGISTERED semantics here: it is what keeps the "
    "unprefixed larger side linear). Verify is the row-local "
    "broadcast array_intersect (d05's discipline).",
)
def d19_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop-filtered shingle containment ≥ 0.9, prefix-pruned on the
    smaller side only."""
    from ..functions.dedup import containment_pairs

    (docs,) = _ctx(spark, sf_dir, "documents")
    return containment_pairs(docs, threshold=0.9, max_df=64)


# ---------------------------------------------------------------------------
# src06: parquet schema-evolution read (mergeSchema)
# ---------------------------------------------------------------------------


@_register(
    "src06_schema_evolution",
    """
    SELECT CASE WHEN event_id % 2 = 0 THEN 1 ELSE 2 END AS schema_gen,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_value_micro,
           CAST(count(CASE WHEN event_id % 2 <> 0 THEN event_type END)
                AS BIGINT) AS n_typed
    FROM events
    GROUP BY 1
    """,
    survey="S-family completion: parquet SCHEMA EVOLUTION — the table "
    "is written as two generations (gen 1 without the event_type "
    "column, gen 2 with it — the add-a-column migration every "
    "long-lived 100 TB dataset accumulates) and read back through ONE "
    "mergeSchema scan that reconciles the footers: gen-1 rows surface "
    "the missing column as NULL, pinned by n_typed = count(event_type) "
    "being exactly the gen-2 row count. Aggregate equality against the "
    "unsplit oracle proves rows, values (micro-unit exact), and "
    "NULL-fill semantics all survive the evolution. At scale the "
    "mergeSchema footer reconciliation is a one-time planning cost; "
    "the scan itself stays pruned and parallel.",
    note="schema_gen derives from event_id parity — the same "
    "deterministic split the writer used, so the oracle needs no "
    "knowledge of the temp directories.",
)
def src06_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write two schema generations, read back via mergeSchema, prove
    NULL-fill and value preservation by aggregate equality."""
    import os
    import tempfile

    (events,) = _ctx(spark, sf_dir, "events")
    tmp = os.path.join(tempfile.mkdtemp(prefix="src06_"), "events_evo")
    gen1 = events.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "user_id", "value"
    )
    gen2 = events.filter(F.col("event_id") % 2 != 0).select(
        "event_id", "user_id", "value", "event_type"
    )
    gen1.write.mode("overwrite").parquet(os.path.join(tmp, "gen=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(tmp, "gen=2"))
    back = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(tmp, "gen=1"), os.path.join(tmp, "gen=2")
    )
    return back.groupBy(
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(2).alias("schema_gen")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(
            F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
        )
        .cast("long")
        .alias("sum_value_micro"),
        F.count("event_type").cast("long").alias("n_typed"),
    )


# ---------------------------------------------------------------------------
# t21: bigram-LM document scoring (Laplace-smoothed)
# ---------------------------------------------------------------------------


@_register(
    "t21_bigram_lm_score",
    """
    WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+')
                         AS w
                  FROM documents),
    pairs AS (SELECT doc_id, w[i] AS prev, w[i+1] AS cur
              FROM toks, range(1, 4096) t(i) WHERE i + 1 <= len(w)),
    bg AS (SELECT prev, cur, count(*) AS c2 FROM pairs GROUP BY 1, 2),
    heads AS (SELECT prev, sum(c2) AS c1 FROM bg GROUP BY prev),
    vv AS (SELECT count(DISTINCT cur)::DOUBLE AS v FROM pairs)
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(-ln((b.c2 + 1)::DOUBLE / (h.c1::DOUBLE + vv.v))), 9)
             AS score_neglogp
    FROM pairs p
    JOIN bg b ON b.prev = p.prev AND b.cur = p.cur
    JOIN heads h ON h.prev = p.prev
    CROSS JOIN vv
    GROUP BY p.doc_id
    """,
    survey="north-star text completion: bigram-LM document scoring "
    "with Laplace smoothing — the corpus trains its own bigram model "
    "p(w|prev)=(c(prev,w)+1)/(c(prev)+V) over the adjacent-pair "
    "relation (heads and continuation vocabulary derived from the SAME "
    "relation, so the model is self-consistent) and each doc scores "
    "avg(−ln p): the KenLM/CCNet perplexity quality gate one model "
    "order above t10. Row-local bigram assembly (no position window), "
    "Zipf-bounded model aggregates broadcast back onto the pair "
    "stream; round(,9) absorbs libm/summation noise (t10's contract).",
)
def t21_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg(-ln p(w|prev)) per doc under the corpus's own smoothed
    bigram model."""
    from ..functions.text import bigram_lm_score

    (docs,) = _ctx(spark, sf_dir, "documents")
    return bigram_lm_score(docs)


# ---------------------------------------------------------------------------
# o17: MERGE upsert/delete (the lakehouse MERGE INTO shape)
# ---------------------------------------------------------------------------


@_register(
    "o17_merge_upsert",
    """
    WITH base AS (
      SELECT user_id, value AS b_value, epoch_us(ts) AS b_ts_us
      FROM (SELECT user_id, value, ts,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '2024-06-01')
      WHERE rn = 1),
    chg AS (
      SELECT user_id, value AS c_value, epoch_us(ts) AS c_ts_us,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM (SELECT user_id, value, ts, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts >= TIMESTAMP '2024-06-01')
      WHERE rn = 1)
    SELECT coalesce(b.user_id, c.user_id) AS user_id,
           CASE WHEN c.user_id IS NULL THEN b.b_value ELSE c.c_value END
             AS value,
           CASE WHEN c.user_id IS NULL THEN b.b_ts_us ELSE c.c_ts_us END
             AS ts_us,
           CASE WHEN c.user_id IS NULL THEN 'base'
                WHEN b.user_id IS NULL THEN 'insert'
                ELSE 'update' END AS src
    FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
    WHERE c.op IS NULL OR c.op <> 'D'
    """,
    survey="O-family completion: MERGE upsert/delete — the lakehouse "
    "MERGE INTO shape (Delta/Iceberg's daily pattern): a per-key base "
    "snapshot (last pre-cutoff state, deterministic ties by "
    "(ts,event_id)) full-outer-merged with a change feed reduced to "
    "last-writer-wins ops (last post-cutoff event per key; "
    "event_type='error' plays the DELETE). Matched+op=U rewrites, "
    "matched+op=D drops, unmatched change inserts, untouched base "
    "survives — the full WHEN MATCHED/NOT MATCHED matrix in one "
    "declarative plan. Both sides reduce per-key BEFORE the join "
    "(max-by struct per key — map-side combining; the join carries one "
    "row per key per side, never raw events), and the merge key "
    "partitioning is exactly what a bucketed 100 TB base table "
    "pre-provides, so at scale the join is co-located and only the "
    "(small) change feed shuffles; AQE's skew split covers hot keys.",
)
def o17_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base snapshot + change feed -> merged state (upsert/delete,
    last-writer-wins)."""
    (ev,) = _ctx(spark, sf_dir, "events")
    cutoff = F.lit("2024-06-01").cast("timestamp")
    pick = F.max(
        F.struct("ts", "event_id", "value", "event_type")
    ).alias("_last")
    base = (
        ev.filter(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(pick)
        .select(
            "user_id",
            F.col("_last.value").alias("b_value"),
            F.unix_micros("_last.ts").alias("b_ts_us"),
            # explicit presence marker: NULL-valued base columns must
            # not read as "no base row" after the outer join
            F.lit(1).alias("b_present"),
        )
    )
    chg = (
        ev.filter(F.col("ts") >= cutoff)
        .groupBy("user_id")
        .agg(pick)
        .select(
            "user_id",
            F.col("_last.value").alias("c_value"),
            F.unix_micros("_last.ts").alias("c_ts_us"),
            F.when(F.col("_last.event_type") == "error", "D")
            .otherwise("U")
            .alias("op"),
        )
    )
    b, c = base.alias("b"), chg.alias("c")
    merged = b.join(c, "user_id", "full_outer")
    return merged.filter(
        F.col("op").isNull() | (F.col("op") != "D")
    ).select(
        "user_id",
        F.when(F.col("op").isNull(), F.col("b_value"))
        .otherwise(F.col("c_value"))
        .alias("value"),
        F.when(F.col("op").isNull(), F.col("b_ts_us"))
        .otherwise(F.col("c_ts_us"))
        .alias("ts_us"),
        F.when(F.col("op").isNull(), "base")
        .when(F.col("b_present").isNull(), "insert")
        .otherwise("update")
        .alias("src"),
    )


# ---------------------------------------------------------------------------
# j14: dynamic partition pruning (runtime dim-filter -> fact scan prune)
# ---------------------------------------------------------------------------


@_register(
    "j14_dynamic_partition_pruning",
    """
    WITH dim AS (
      SELECT DISTINCT event_type FROM events
      WHERE event_type IN ('click', 'purchase')),
    fact AS (SELECT event_type, user_id, value FROM events)
    SELECT f.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(f.value * 1000000.0 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_value_micro
    FROM fact f JOIN dim d ON d.event_type = f.event_type
    GROUP BY f.event_type
    """,
    survey="J-family completion: DYNAMIC partition pruning — the fact "
    "side is written hive-partitioned by event_type and joined to a "
    "FILTERED dim whose qualifying keys are only known at runtime, so "
    "Catalyst injects a dynamicpruning subquery into the fact scan's "
    "partition filters: the broadcast of the dim side doubles as the "
    "list of partitions the fact scan is allowed to LIST. src05 pins "
    "the static cousin (a literal predicate in PartitionFilters); this "
    "is the shape that matters on a 100 TB star schema, where the "
    "pruning predicate comes from a dimension filter, not a literal — "
    "without DPP the fact scan reads every partition and the join "
    "discards 3/5 of the I/O after the fact. The plan-shape test pins "
    "the dynamicpruning expression in the scan.",
    note="The dim is derived from the same events table (DISTINCT "
    "event_type under an IN filter) so the oracle needs no second "
    "table; Spark sees it as a genuine runtime-valued relation.",
)
def j14_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned fact ⋈ filtered dim with runtime partition
    pruning, proven by aggregate equality vs the unpartitioned oracle."""
    import os
    import tempfile

    (events,) = _ctx(spark, sf_dir, "events")
    tmp = os.path.join(tempfile.mkdtemp(prefix="j14_"), "events_part")
    events.write.mode("overwrite").partitionBy("event_type").parquet(tmp)
    fact = spark.read.parquet(tmp)
    dim = (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type")
        .distinct()
    )
    return (
        fact.join(dim.hint("broadcast"), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(
                F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("sum_value_micro"),
        )
    )


# ---------------------------------------------------------------------------
# m10: image near-dup via aHash + hamming band join
# ---------------------------------------------------------------------------

#: (doc_id, simhash_bits) derivation of the image aHash from the md5
#: sample stream — content keyed by g = doc_id // 2, odd siblings
#: perturb sample 0 by +1 mod 256 (with_ppm_pair_payload's rule), NN
#: 8x8 grid via integer division (resize_ppm_nn's index rule), bit =
#: 64*cell_luma > total. Aliased simhash_bits for the shared d09
#: band/refine template.
#: Shared CTE prefix re-deriving the with_ppm_pair_payload sample
#: stream down to the 8×8 NN luma grid — (doc_id, r, c, luma) rows.
#: m10 thresholds these cells directly (aHash); m11 (q_extensions8)
#: runs the fixed-point DCT over the same grid (pHash).
_PPM_CELLS_CTES = """
      WITH d AS (SELECT doc_id, doc_id // 2 AS g,
                        3 + (doc_id // 2) % 6 AS w,
                        2 + (doc_id // 2) % 4 AS h
                 FROM documents),
      s AS (SELECT d.doc_id, d.w, d.h, u.k,
                   ((strpos('0123456789abcdef',
                            substr(md5(CAST(d.g AS VARCHAR) || ':'
                                       || CAST(u.k AS VARCHAR)), 1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef',
                              substr(md5(CAST(d.g AS VARCHAR) || ':'
                                         || CAST(u.k AS VARCHAR)), 2, 1)) - 1)
                    + CASE WHEN d.doc_id % 2 = 1 AND u.k = 0
                           THEN 1 ELSE 0 END) % 256 AS v
            FROM d, LATERAL (SELECT unnest(generate_series(0, 3*d.w*d.h - 1))
                             AS k) u),
      pix AS (SELECT doc_id, w, h, k // 3 AS p,
                     sum(CASE WHEN k % 3 = 0 THEN 299 * v
                              WHEN k % 3 = 1 THEN 587 * v
                              ELSE 114 * v END) AS luma
              FROM s GROUP BY doc_id, w, h, k // 3),
      cells AS (SELECT p1.doc_id, rr.r, cc.c, p2.luma
                FROM (SELECT DISTINCT doc_id, w, h FROM pix) p1,
                     (SELECT unnest(generate_series(0, 7)) AS r) rr,
                     (SELECT unnest(generate_series(0, 7)) AS c) cc
                JOIN pix p2 ON p2.doc_id = p1.doc_id
                           AND p2.p = (rr.r * p1.h // 8) * p1.w
                                      + (cc.c * p1.w // 8))
"""

_M10_BITS_SQL = f"""
    SELECT bb.doc_id, bb.b AS simhash_bits FROM (
      {_PPM_CELLS_CTES},
      tot AS (SELECT doc_id, sum(luma) AS t FROM cells GROUP BY doc_id)
      SELECT c.doc_id,
             string_agg(CASE WHEN 64 * c.luma > t.t THEN '1' ELSE '0' END,
                        '' ORDER BY c.r, c.c) AS b
      FROM cells c JOIN tot t USING (doc_id)
      GROUP BY c.doc_id) bb
"""


@_register(
    "m10_image_ahash_neardup",
    None,  # assigned below via the shared d09 band/refine template
    survey="north-star multimodal completion: IMAGE near-dup — 64-bit "
    "average-hash (aHash) fingerprints computed from genuinely parsed "
    "PPM containers (NN 8×8 grid by resize_ppm_nn's integer index "
    "rule, integer Rec.601 luma, bit = 64·cell > Σcells so the "
    "threshold is exact integer arithmetic), then the d09 pigeonhole "
    "band join + bit_count(xor) hamming refine over the SAME "
    "hamming_pairs_from_bits machinery the text SimHash path uses — "
    "perceptual image dedup as a composition of two already-verified "
    "legs. Sibling payloads (content keyed by doc_id//2, odd ids "
    "perturb one channel of one pixel) plant genuine near-duplicates "
    "so the compare is non-vacuous at every SF; the oracle re-derives "
    "every sample byte, the NN grid, the integer threshold, and the "
    "band/refine from the md5 stream.",
    note="REGISTERED CAPPED (bucket_cap=64, the library default, d13's "
    "star-cap oracle template) — unlike d09's text SimHash, aHash bands "
    "on small images are LOW-ENTROPY (the 8×8 NN grid replicates "
    "source pixels, so band values concentrate far below 2^16): the "
    "uncapped band join was measured at 100× shuffling its way into "
    "disk exhaustion (841s, killed by the sweep harness), the exact "
    "quadratic trap the star cap exists for. Same output on every "
    "corpus whose buckets stay under the cap (sf0.001 identity pinned "
    "by test).",
)
def m10_image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aHash fingerprints of sibling-pair PPM images -> hamming ≤ 3
    pairs via the pigeonhole band join."""
    from ..functions.dedup import hamming_pairs_from_bits
    from ..functions.multimodal import ahash_bits, with_ppm_pair_payload
    from ..sources.tables import scale_out

    (docs,) = _ctx(spark, sf_dir, "documents")
    # scale_out HERE, unlike m05/m07/m08 (their kernels are the whole
    # query, cheap enough to amortize one task at the tested corpora):
    # m10 pays ~60 ASCII int parses per image TWICE (generator + hash)
    # and then feeds a join — on the driver's single-row-group 100x
    # layout the unbalanced form ran ONE task for ~20 min before the
    # band join even started (measured, killed); rebalanced it tracks
    # the other codec kernels
    fps = ahash_bits(
        with_ppm_pair_payload(scale_out(docs.select("doc_id"), "doc_id"))
    )
    return hamming_pairs_from_bits(
        fps, bits_col="ahash_bits", bits=64, max_hamming=3, n_bands=4,
        bucket_cap=64,
    )


from .q_dedup_pairs import _d13_oracle  # noqa: E402

QUERIES["m10_image_ahash_neardup"].oracle = _d13_oracle(
    bits=64, n_bands=4, cap=64, sh_sql=_M10_BITS_SQL
)


# ---------------------------------------------------------------------------
# t22: token-distribution drift monitor (smoothed KL contributions)
# ---------------------------------------------------------------------------


@_register(
    "t22_token_drift",
    """
    WITH toks AS (
      SELECT doc_id % 2 = 0 AS is_ref,
             u.tok AS token
      FROM documents,
           LATERAL (SELECT unnest(regexp_extract_all(lower(text),
                    '[a-z0-9]+')) AS tok) u),
    counts AS (SELECT token,
                      sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
                      sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cand
               FROM toks GROUP BY token),
    tot AS (SELECT sum(n_ref)::DOUBLE AS nr, sum(n_cand)::DOUBLE AS nc,
                   count(*)::DOUBLE AS v
            FROM counts),
    scored AS (
      SELECT c.token,
             CAST(c.n_ref AS BIGINT) AS n_ref,
             CAST(c.n_cand AS BIGINT) AS n_cand,
             CAST(round(((c.n_ref + 1)::DOUBLE / (t.nr + t.v))
                  * ln(((c.n_ref + 1)::DOUBLE / (t.nr + t.v))
                       / ((c.n_cand + 1)::DOUBLE / (t.nc + t.v)))
                  * 1e9) AS BIGINT) AS kl_nano
      FROM counts c CROSS JOIN tot t)
    SELECT CAST(row_number() OVER (ORDER BY kl_nano DESC, token) AS BIGINT)
             AS rank,
           token, n_ref, n_cand, kl_nano
    FROM scored ORDER BY kl_nano DESC, token LIMIT 20
    """,
    survey="north-star text completion: token-distribution DRIFT "
    "monitor — top-20 tokens by Laplace-smoothed KL contribution "
    "p·ln(p/q) between a reference split (doc_id%2==0) and a candidate "
    "split, over the shared vocabulary so every contribution is "
    "finite. The drift dashboard every continuously-fed training mix "
    "needs: a crawl source going off-distribution surfaces as "
    "over/under-represented tokens long before eval regressions. One "
    "corpus pass (map-side-combining (token,split) counts), then "
    "vocab-sized row-local math against a broadcast scalar row and a "
    "TakeOrderedAndProject top-k; score emitted as exact "
    "round(·1e9) int64 under the t10 ln-rounding contract.",
)
def t22_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 smoothed KL-contribution tokens between the two corpus
    halves."""
    from ..functions.text import token_drift_topk

    (docs,) = _ctx(spark, sf_dir, "documents")
    return token_drift_topk(docs, split_mod=2, k=20)

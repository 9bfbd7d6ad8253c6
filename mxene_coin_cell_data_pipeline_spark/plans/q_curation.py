"""Curation-family queries: the remaining large-scale training-data
pipeline stages — benchmark decontamination, sequence packing, domain
mixture resampling, embedding quantization.

These are north-star extensions (no reference counterpart;
SURVEY.md §2.13): the operations a 100 TB pretraining-data pipeline
runs AFTER dedup/quality filtering (t13's funnel) and BEFORE training —
removing eval-benchmark contamination, packing documents into
fixed-size context windows, rebalancing the domain mixture, and
compressing embeddings for the ANN index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ._registry import QUERIES, _ctx, _register  # noqa: F401


@_register(
    "d15_decontaminate",
    """
    WITH toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
                  FROM documents),
    sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
           FROM toks, range(1, 4096) t(i) WHERE i + 2 <= len(w)),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    tr AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
    per AS (
      SELECT tr.doc_id, count(*) AS n_sh,
             count(*) FILTER (WHERE bench.shingle IS NOT NULL) AS n_hit
      FROM tr LEFT JOIN bench ON tr.shingle = bench.shingle
      GROUP BY tr.doc_id)
    SELECT doc_id, n_sh, n_hit,
           n_hit * 1.0 / n_sh >= 0.05 AS contaminated
    FROM per
    """,
    survey="north-star curation: eval-benchmark decontamination by "
    "n-gram collision (the GPT-3/PaLM discipline: a training doc sharing "
    "n-grams with a held-out benchmark is flagged/dropped). Plan: ONE "
    "corpus shingle scan; the benchmark n-gram set is tiny relative to "
    "the corpus and broadcast, so the collision probe is a map-side "
    "broadcast left join — the corpus never shuffles on shingle; the only "
    "exchange is the per-doc count aggregate (map-side partial). At "
    "100 TB the benchmark side stays a few million n-grams (MB-scale "
    "broadcast) no matter how big the corpus grows.",
    note="Benchmark stand-in: docs with doc_id % 50 = 0 (deterministic "
    "held-out subset). contaminated = hit fraction >= 0.05; the flag is "
    "an exact integer ratio compare, engine-portable.",
)
def d15_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs whose 3-gram shingle sets collide with the
    benchmark set's shingles. The broadcast of the benchmark n-gram
    set (not a shuffle of the corpus) is the 100 TB design point."""
    from ..functions.dedup import shingles

    (docs,) = _ctx(spark, sf_dir, "documents")
    sh = shingles(docs, "text", n=3)
    bench = (
        sh.filter(F.col("doc_id") % 50 == 0)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train = sh.filter(F.col("doc_id") % 50 != 0)
    per = (
        train.join(F.broadcast(bench), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.count("_hit").alias("n_hit"),
        )
    )
    return per.select(
        "doc_id",
        "n_sh",
        "n_hit",
        (F.col("n_hit") * F.lit(1.0) / F.col("n_sh") >= F.lit(0.05)).alias(
            "contaminated"
        ),
    )


@_register(
    "o15_sequence_pack",
    """
    WITH t AS (
      SELECT doc_id, source,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tok
      FROM documents),
    c AS (
      SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
      FROM t)
    SELECT doc_id, source, n_tok,
           CAST(floor((cum - n_tok) / 512.0) AS BIGINT) AS pack_id,
           CAST((cum - n_tok) % 512 AS BIGINT) AS pack_offset,
           floor((cum - 1) / 512.0) > floor((cum - n_tok) / 512.0)
             AS crosses_boundary
    FROM c
    """,
    survey="north-star curation: concat-and-chunk sequence packing — "
    "assign every document a (pack_id, offset) inside fixed 512-token "
    "context windows via a per-source cumulative token sum (the GPT-style "
    "pack-then-split layout; crosses_boundary marks docs a trainer would "
    "split across windows). Plan: one window cumsum PER SOURCE SHARD, not "
    "a global sort — at 100 TB each shard packs independently in "
    "parallel (pack ids are per-shard, exactly like per-file packing in "
    "a real tokenizer pipeline), so the only exchange is the hash "
    "partition by source; no global coordination point exists.",
    note="Deterministic: doc_id is the intra-shard order. n_tok >= 1 "
    "for every generated doc, so cum-1 >= cum-n_tok and the boundary "
    "flag is well-defined.",
)
def o15_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 512-token context windows per source shard:
    cumulative token count -> pack_id/offset, flagging boundary
    crossers. Per-shard windows keep packing embarrassingly parallel."""
    (docs,) = _ctx(spark, sf_dir, "documents")
    n_tok = F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0))
    w = Window.partitionBy("source").orderBy("doc_id")
    c = docs.select("doc_id", "source", n_tok.alias("n_tok")).withColumn(
        "cum", F.sum("n_tok").over(w)
    )
    start = F.col("cum") - F.col("n_tok")
    pack = F.floor(start / F.lit(512.0))
    return c.select(
        "doc_id",
        "source",
        "n_tok",
        pack.cast("long").alias("pack_id"),
        (start % F.lit(512)).alias("pack_offset"),
        (F.floor((F.col("cum") - F.lit(1)) / F.lit(512.0)) > pack).alias(
            "crosses_boundary"
        ),
    )


@_register(
    "o16_domain_mixture",
    """
    WITH cnt AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY lang),
    tgt AS (SELECT min(n_before) AS m FROM cnt),
    r AS (SELECT lang, n_before, m * 1.0 / n_before AS rate FROM cnt, tgt),
    u AS (
      SELECT d.doc_id, d.lang,
             (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT)
               / 4294967296.0 AS uni
      FROM documents d),
    kept AS (
      SELECT u.doc_id, u.lang
      FROM u JOIN r ON r.lang = u.lang
      WHERE u.uni < r.rate)
    SELECT r.lang, r.n_before, r.rate,
           count(kept.doc_id) AS n_kept,
           CAST(coalesce(sum(kept.doc_id), 0) AS BIGINT) AS sum_kept_ids
    FROM r LEFT JOIN kept ON kept.lang = r.lang
    GROUP BY r.lang, r.n_before, r.rate
    """,
    survey="north-star curation: domain-mixture resampling — rebalance "
    "the per-language corpus shares to a target mixture (here: downsample "
    "every language to the rarest language's count) with DETERMINISTIC "
    "per-doc hash thresholds, so the kept set is reproducible across "
    "runs, engines, and partitionings (sum_kept_ids pins set identity, "
    "not just counts). Plan: tiny per-domain count aggregate -> rate "
    "table broadcast back over one corpus scan (map-side filter, no "
    "corpus shuffle) -> per-domain rollup. At 100 TB the rate table is "
    "O(#domains) and the resample is a single scan-filter.",
    note="uni = first-8-hex-of-md5 / 2^32 in [0,1) — identical doubles "
    "on both engines; rate = exact integer-ratio double. The expected "
    "kept count is rate*n (binomial, not exact-n); o06 is the exact-n "
    "variant when hard guarantees are needed.",
)
def o16_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample every language to the min-language count via
    deterministic md5 thresholds; emit per-lang before/after and an
    identity-pinning checksum of kept doc_ids."""
    (docs,) = _ctx(spark, sf_dir, "documents")
    cnt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_before"))
    tgt = cnt.agg(F.min("n_before").alias("m"))
    rates = cnt.crossJoin(F.broadcast(tgt)).select(
        "lang", "n_before", (F.col("m") * F.lit(1.0) / F.col("n_before")).alias("rate")
    )
    uni = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )
    kept = (
        docs.select("doc_id", "lang", uni.alias("uni"))
        .join(F.broadcast(rates.select("lang", "rate")), "lang")
        .filter(F.col("uni") < F.col("rate"))
    )
    per_kept = kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("sum_kept_ids"),
    )
    return (
        rates.join(per_kept, "lang", "left")
        .select(
            "lang",
            "n_before",
            "rate",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("sum_kept_ids"), F.lit(0)).alias("sum_kept_ids"),
        )
    )


@_register(
    "t14_dsir_resample",
    """
    WITH toks AS (
      SELECT d.doc_id, d.lang,
             unnest(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS tok
      FROM documents d),
    src AS (SELECT tok, count(*) AS cnt_s FROM toks GROUP BY tok),
    tgt AS (SELECT tok, count(*) AS cnt_t FROM toks WHERE lang = 'en'
            GROUP BY tok),
    tot AS (SELECT (SELECT count(*)::DOUBLE FROM toks) AS ts,
                   (SELECT count(*)::DOUBLE FROM toks WHERE lang = 'en') AS tt,
                   (SELECT count(*)::DOUBLE FROM src) AS v),
    vocab AS (
      SELECT s.tok,
             ln((coalesce(t.cnt_t, 0) + 1) / (tot.tt + tot.v))
               - ln((s.cnt_s + 1) / (tot.ts + tot.v)) AS lr
      FROM src s LEFT JOIN tgt t ON t.tok = s.tok, tot),
    per AS (
      SELECT k.doc_id, k.lang, count(*) AS n_tokens,
             round(avg(v.lr), 9) AS lr_r
      FROM toks k JOIN vocab v ON v.tok = k.tok
      GROUP BY k.doc_id, k.lang)
    SELECT doc_id, lang, n_tokens, lr_r,
           round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                     + 1.0) / 4294967296.0), 9) < lr_r AS selected
    FROM per
    """,
    survey="north-star curation: DSIR-style importance resampling — score "
    "every document by its average token log-likelihood RATIO between a "
    "target-domain unigram model (here: the 'en' slice) and the source "
    "(whole-corpus) model, add-1 smoothed, then keep docs where a "
    "deterministic md5 uniform falls under the importance weight "
    "(ln u < log-ratio — sampling probability proportional to "
    "exp(avg lr), the Data Selection via Importance Resampling recipe "
    "with a unigram feature space). Plan: two Zipf-bounded vocab "
    "aggregates merged into ONE broadcast ratio table + one doc "
    "aggregate — the corpus token stream shuffles once (doc agg); at "
    "100 TB the vocab broadcast is the same one t10's LM scoring "
    "already holds.",
    note="Both engines compute the same doubles: counts are exact ints, "
    "ln of identical doubles, avg rounded to 1e-9 on both sides; the "
    "keep decision compares 1e-9-rounded values so a last-ulp libm "
    "divergence cannot flip it off-grid. u = (md5_32 + 1)/2^32 in (0,1] "
    "so ln(u) is finite.",
)
def t14_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-resample the corpus toward the 'en' unigram
    distribution: per-doc smoothed avg log-ratio + deterministic
    keep/drop draw."""
    from ..functions.text import tokenize

    (docs,) = _ctx(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    src = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt_s"))
    tgt = (
        toks.filter(F.col("lang") == "en")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt_t"))
    )
    tot = toks.agg(
        F.count(F.lit(1)).cast("double").alias("ts"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("double")
        .alias("tt"),
        F.count_distinct(F.col("tok")).cast("double").alias("v"),
    )
    vocab = (
        src.join(tgt, "tok", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "tok",
            (
                F.log(
                    (F.coalesce(F.col("cnt_t"), F.lit(0)) + F.lit(1))
                    / (F.col("tt") + F.col("v"))
                )
                - F.log((F.col("cnt_s") + F.lit(1)) / (F.col("ts") + F.col("v")))
            ).alias("lr"),
        )
    )
    per = (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lr"), 9).alias("lr_r"),
        )
    )
    ln_u = F.round(
        F.log(
            (
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
                ).cast("double")
                + F.lit(1.0)
            )
            / F.lit(4294967296.0)
        ),
        9,
    )
    return per.select(
        "doc_id", "lang", "n_tokens", "lr_r", (ln_u < F.col("lr_r")).alias("selected")
    )


@_register(
    "s08_semdedup",
    """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS x FROM embeddings),
    p AS (
      SELECT b.vec_id AS vb,
             round(list_dot_product(a.x, b.x)
               / (sqrt(list_dot_product(a.x, a.x))
                  * sqrt(list_dot_product(b.x, b.x))), 9) AS c
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
    m AS (SELECT vb, max(c) AS mx FROM p GROUP BY vb)
    SELECT e.vec_id, e.label, m.mx AS max_prior_cos,
           (m.mx IS NULL OR m.mx < 0.4) AS keep
    FROM e LEFT JOIN m ON m.vb = e.vec_id
    """,
    survey="north-star curation: SemDeDup — semantic deduplication of an "
    "embedding corpus: within each cluster (the k-means label s05 "
    "maintains), drop every vector whose max cosine to any EARLIER "
    "cluster member exceeds tau (first-occurrence-wins, the d10 "
    "scale-safe keeper rule). The prior-max reduces INSIDE a chunked "
    "BLAS gemm per cluster (semdedup_prior_max — O(n) rows out, worker "
    "memory bounded by gemm panels, never the n^2 pair triangle the "
    "pair-threshold kernel would materialize); FLOPs stay SemDeDup's "
    "inherent cluster_size^2 * dim, bounded by the clustering fan-out "
    "— at 100 TB cluster granularity is the knob (the paper runs "
    "k ~ sqrt(n)).",
    note="tau=0.4 is non-vacuous on the synthetic embeddings (max "
    "within-label cosine ~0.475); inclusion decisions compare "
    "1e-9-rounded cosines on both engines, the d04 discipline.",
)
def s08_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop per vector: drop when cosine to some earlier same-label
    vector >= 0.4; max-prior-cosine emitted for threshold tuning."""
    from ..functions.similarity import semdedup_prior_max

    (emb,) = _ctx(spark, sf_dir, "embeddings")
    prior = semdedup_prior_max(emb)
    mx = F.round(F.col("max_prior_cos"), 9)
    return prior.select(
        "vec_id",
        "label",
        mx.alias("max_prior_cos"),
        (mx.isNull() | (mx < F.lit(0.4))).alias("keep"),
    )


@_register(
    "s07_int8_quantize",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
    p AS (SELECT vec_id, x,
                 list_max(list_transform(x, v -> abs(v))) / 127.0 AS s
          FROM e),
    m AS (SELECT vec_id, s,
                 CASE WHEN s = 0 THEN 0.0 ELSE
                   list_sum(list_transform(x,
                     v -> pow(v - floor(v / s + 0.5) * s, 2))) / len(x)
                 END AS mse,
                 CASE WHEN s = 0 THEN 0.0 ELSE
                   list_max(list_transform(x,
                     v -> abs(v - floor(v / s + 0.5) * s)))
                 END AS max_err
          FROM p)
    SELECT vec_id, round(s, 9) AS scale_r, round(mse, 12) AS mse_r,
           max_err <= s * 0.5 + 1e-12 AS err_ok
    FROM m
    """,
    survey="north-star similarity: symmetric int8 embedding quantization "
    "(per-vector scale = max|x|/127, q = floor(x/s + 0.5)) with "
    "reconstruction MSE and the |err| <= s/2 quantization bound verified "
    "in-query. Row-local array HOFs — zero shuffle, whole-stage codegen; "
    "at 100 TB this is the 4x index-compression pass before the IVF/LSH "
    "ANN stages (s02/d07), whose bucket probes then scan int8 codes. "
    "floor(x+0.5) not round(): IEEE-deterministic on both engines "
    "(round() half-even tie-breaking differs), the g01/e10 fixed-point "
    "idiom.",
    note="mse rounded to 1e-12 (64-element fold accumulation slack); "
    "scale rounded to 1e-9. Zero vectors quantize to mse 0 via the s=0 "
    "guard.",
)
def s07_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 quantization of the embedding column: scale,
    reconstruction MSE, and the half-step error bound as a checked
    boolean — all row-local (no shuffle)."""
    (emb,) = _ctx(spark, sf_dir, "embeddings")
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    e = emb.select("vec_id", x.alias("x"))
    s = F.array_max(F.transform(F.col("x"), F.abs)) / F.lit(127.0)
    p = e.select("vec_id", "x", s.alias("s"))
    dq = F.transform(
        F.col("x"),
        lambda v: v - F.floor(v / F.col("s") + F.lit(0.5)) * F.col("s"),
    )
    m = p.select(
        "vec_id",
        "s",
        F.when(F.col("s") == 0, F.lit(0.0))
        .otherwise(
            F.aggregate(
                F.transform(dq, lambda d: d * d),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.size(F.col("x"))
        )
        .alias("mse"),
        F.when(F.col("s") == 0, F.lit(0.0))
        .otherwise(F.array_max(F.transform(dq, F.abs)))
        .alias("max_err"),
    )
    return m.select(
        "vec_id",
        F.round(F.col("s"), 9).alias("scale_r"),
        F.round(F.col("mse"), 12).alias("mse_r"),
        (F.col("max_err") <= F.col("s") * F.lit(0.5) + F.lit(1e-12)).alias("err_ok"),
    )

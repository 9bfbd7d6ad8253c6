"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need samples and train/valid/test splits that
are (a) reproducible across runs and engines, (b) stable under
repartitioning and data reordering, and (c) consistent per key (a
document keeps its split forever, even when the corpus grows).
``rand()``/TABLESAMPLE give none of these. The standard answer is a
keyed hash bucket: ``md5(key) → uniform int → bucket ∈ [0, 100)`` —
pure column expressions, codegen end to end, no shuffle, and any SQL
engine reproduces it bit-for-bit (the same trick seeds the sign-LSH
hyperplanes, functions/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(key: Column, n_buckets: int = 100, salt: str = "") -> Column:
    """Deterministic uniform bucket in [0, n_buckets) from a key:
    first 8 hex chars of md5 → int → mod. ``salt`` derives independent
    bucketings from the same key (one per experiment)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8), 16, 10
    ).cast("long")
    return h % n_buckets


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, int] | None = None,
    salt: str = "",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split by
    hash bucket of ``key``. ``weights`` maps split name → percent
    (must sum to 100); default 80/10/10 train/valid/test. Per-key
    stable: the same key lands in the same split in every run, every
    engine, every partition count."""
    weights = weights or {"train": 80, "valid": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError(f"split weights must sum to 100: {weights}")
    bucket = hash_bucket(F.col(key), 100, salt)
    expr, lo = None, 0
    for name, pct in weights.items():
        lo += pct
        expr = (
            F.when(bucket < lo, name) if expr is None else expr.when(bucket < lo, name)
        )
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame, key: str, percent: int, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~percent% sample by hash bucket of ``key``.
    Stable under growth: rows present in a 1% sample are also in the
    10% sample (nested samples for cheap progressive scale-up)."""
    return df.filter(hash_bucket(F.col(key), 100, salt) < percent)


def stratified_sample(
    df: DataFrame, stratum: str, key: str, n_per_stratum: int, salt: str = ""
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample: rank rows inside
    each stratum by md5(key) (a uniform, engine-portable shuffle
    order) and keep the first ``n_per_stratum``. Unlike
    ``df.sampleBy`` (fraction-approximate, seed/partitioning
    dependent) this is exact-size, reproducible across engines and
    runs, and per-key stable under append-only growth of OTHER strata.

    One shuffle (the per-stratum window sort); at scale the rank
    only needs the top-n so AQE's partial TakeOrdered applies per
    stratum when n is small. ``rank`` is kept in the output so
    nested samples (first m < n rows) stay valid without resampling.
    """
    from pyspark.sql import Window

    order = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    w = Window.partitionBy(stratum).orderBy(order, F.col(key))
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_per_stratum)
    )


def weighted_sample_per_group(
    df: DataFrame,
    key: str,
    weight: str,
    group: str | None = None,
    n: int = 10,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row draws a reproducible uniform
    ``u`` from ``md5(salt || key)`` and scores ``skey = -ln(u) / w``;
    the ``n`` smallest scores per group are the sample. Inclusion
    probability tracks the weight exactly as the classic algorithm,
    but — because u is a keyed hash, not rand() — the sample is
    reproducible across runs, engines, and partitionings, and adding
    rows never reshuffles the survivors' relative order (nested
    sub-samples stay valid, same rationale as hash_split).

    One window per group (top-n heap under AQE TakeOrdered when
    ungrouped); no collect, no global sort. Rows with NULL/non-positive
    weight are excluded (they'd have undefined inclusion probability).
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(4294967296.0)  # (0, 1]
    skey = -F.log(u) / F.col(weight)
    from pyspark.sql import Window

    part = Window.partitionBy(group) if group else Window.partitionBy(F.lit(1))
    w_ord = part.orderBy(F.asc("skey"), F.asc(key))
    return (
        df.filter(F.col(weight).isNotNull() & (F.col(weight) > 0))
        .withColumn("skey", skey)
        .withColumn("rank", F.row_number().over(w_ord))
        .filter(F.col("rank") <= n)
    )


def integer_quotas(
    counts: DataFrame, budget_den: int = 5, weighting: str = "sqrt"
) -> DataFrame:
    """The INTEGER-ONLY largest-remainder allocation behind
    ``source_mix_quota``, exposed for composed pipelines (p06): input
    one row per source ``(source, n_source)``, output ``(source,
    n_source, w, quota)`` with Σ quota == (Σ n_source) DIV budget_den
    as an identity — every step integer arithmetic, no float boundary
    (the full derivation is documented on ``source_mix_quota``)."""
    from pyspark.sql import Window

    if weighting == "sqrt":
        wexpr = F.floor(F.sqrt(F.col("n_source").cast("double"))).cast("long")
    elif weighting == "linear":
        wexpr = F.col("n_source").cast("long")
    elif weighting == "uniform":
        wexpr = F.lit(1).cast("long")
    else:
        raise ValueError(f"unknown weighting: {weighting}")

    tiny = Window.partitionBy(F.lit(1))
    return (
        counts.withColumn("w", wexpr)
        .withColumn("_N", F.sum("n_source").over(tiny))
        .withColumn("_S", F.sum("w").over(tiny))
        .withColumn("_B", F.expr(f"_N DIV {int(budget_den)}"))
        .withColumn("base", F.expr("(_B * w) DIV _S"))
        .withColumn("rem", F.expr("(_B * w) % _S"))
        .withColumn("_L", F.col("_B") - F.sum("base").over(tiny))
        .withColumn(
            "_r",
            F.row_number().over(
                tiny.orderBy(F.desc("rem"), F.asc("source"))
            ),
        )
        .withColumn(
            "quota",
            F.col("base")
            + F.when(F.col("_r") <= F.col("_L"), 1).otherwise(0),
        )
        .select("source", "n_source", "w", "quota")
    )


def source_mix_quota(
    df: DataFrame,
    source: Column | str,
    key: str = "doc_id",
    budget_den: int = 5,
    weighting: str = "sqrt",
    salt: str = "",
) -> DataFrame:
    """Quota-EXACT temperature-scaled source mixing — the training-mix
    epoch plan: given per-source sizes n_s, allocate an integer quota
    q_s per source with Σ q_s == B EXACTLY (B = N // budget_den) under
    temperature re-weighting, then select exactly q_s rows per source
    deterministically. o06 samples per-stratum fixed n and o08 samples
    by per-row weight; neither hits an exact global budget split by a
    source-level policy — this is the operator a "sample 20% of the
    corpus at temperature 0.5" epoch spec needs.

    EVERY quota step is INTEGER arithmetic, so both engines agree
    bit-for-bit with no float-boundary risk (the d10/_dsum6 stability
    discipline applied to allocation):
    - weight w_s = floor(sqrt(n_s)) for ``weighting="sqrt"`` (the
      multilingual temperature-1/2 rebalance of mBERT/XLM-R — small
      sources up-weighted relative to their share; exact for
      n < 2^52, and our counts sit far below the first float-sqrt
      ambiguity near 2^52), w_s = n_s for ``"linear"``
      (proportional), w_s = 1 for ``"uniform"``;
    - base_s = (B·w_s) DIV S and rem_s = (B·w_s) MOD S with
      S = Σ w_s — integer division, never a rounded double;
    - largest-remainder (Hamilton) completion: the L = B − Σ base_s
      sources with the largest rem_s (ties broken by source asc) get
      +1. Σ quota == B is an IDENTITY of this construction.
    Feasibility (q_s ≤ n_s) holds whenever B ≤ N·min_share under the
    chosen weighting — with budget_den ≥ 2 and sqrt weighting it
    requires only mild balance (a source with < ~B·w_s/S rows would
    exhaust; the property test pins exactness at every SF).

    Selection inside a source is ``stratified_sample``'s machinery:
    rank by md5(salt || key) (uniform, engine-portable, append-stable)
    and keep rank ≤ q_s. Output is a bounded per-source audit row:
    (source, n_source, w, quota, n_selected, sel_sig) with
    ``sel_sig = Σ rank·hash32(key)`` over the selected rows — exact
    identity + order pin without materializing the sample.

    INFEASIBILITY CONTRACT: if a source's quota exceeds its row count
    (q_s > n_s — the mix is infeasible under this weighting), the
    selection silently under-fills that source and the GLOBAL budget
    (Σ n_selected < B). The audit row carries the signal:
    ``n_selected < quota`` on any output row means infeasible — a
    caller enforcing the budget must check it (or compare
    Σ n_selected against Σ quota). It is reported, not raised,
    because the audit row is the operator's output and a partial
    epoch mix is a policy decision, not an engine error.

    Scale: one map-side-combining count, quota math on an
    n_sources-row relation (window over a tiny frame), one broadcast
    join of quotas onto rows, one per-source rank window — the same
    shuffle count as o06 regardless of corpus size.
    """
    from pyspark.sql import Window

    src_col = F.col(source) if isinstance(source, str) else source
    rows = df.select(F.col(key).alias("_key"), src_col.alias("source"))
    counts = rows.groupBy("source").agg(F.count(F.lit(1)).alias("n_source"))
    q = integer_quotas(counts, budget_den=budget_den, weighting=weighting)

    order = F.md5(F.concat(F.lit(salt), F.col("_key").cast("string")))
    sw = Window.partitionBy("source").orderBy(order, F.col("_key"))
    hash32 = F.conv(
        F.substring(F.md5(F.col("_key").cast("string")), 1, 8), 16, 10
    ).cast("long")
    picked = (
        rows.join(F.broadcast(q), "source")
        .withColumn("rank", F.row_number().over(sw))
        .filter(F.col("rank") <= F.col("quota"))
    )
    return (
        picked.groupBy("source")
        .agg(
            F.first("n_source").alias("n_source"),
            F.first("w").alias("w"),
            F.first("quota").alias("quota"),
            F.count(F.lit(1)).cast("long").alias("n_selected"),
            F.sum(F.col("rank") * hash32).cast("long").alias("sel_sig"),
        )
        .select(
            "source", "n_source", "w", "quota", "n_selected", "sel_sig"
        )
    )


def epoch_upsample(
    docs: DataFrame,
    key: str = "doc_id",
    group: str = "source",
    cap: int = 4,
) -> DataFrame:
    """Deterministic FRACTIONAL upsampling — the "data epochs" half of
    mixture construction that o16's downsampler doesn't cover: every
    group is repeated toward the LARGEST group's row count, with a
    non-integer repeat factor realized per row (the way LLM pretrain
    mixtures repeat small high-quality sources ~2.7 epochs while big
    crawl sources run <1; see e.g. the Llama/Gopher mixture tables).

    The factor f = min(cap, M/n_g) (M = max group size) is NEVER
    floated: a row repeats ``whole = M div n_g`` times plus one more
    iff its md5-uniform u32 falls under ``thresh = ((M mod n_g)·2³²)
    div n_g`` — all int64 arithmetic, so expected emitted count equals
    n_g·f exactly in distribution and the REALIZED set is reproducible
    across runs, engines, partitionings (same hash-threshold trick as
    hash_bucket above; binomial in count like o16, per-key stable).

    Returns one audit row per group: ``(group, n_before, whole_epochs,
    extra_thresh, n_emitted, sum_ids, emit_sig)`` where emit_sig =
    Σ key·copy_idx pins the exact emitted multiset (which copies of
    which rows), not just counts. The emission itself is
    ``explode(sequence(1, reps))`` — linear in OUTPUT rows, which is
    the inherent cost of upsampling; everything upstream of the
    explode is one scan plus an O(#groups) broadcast.
    """
    k, g = F.col(key), F.col(group)
    cnt = docs.groupBy(group).agg(F.count(F.lit(1)).cast("long").alias("n_g"))
    mx = cnt.agg(F.max("n_g").alias("m"))
    fac = cnt.crossJoin(F.broadcast(mx)).select(
        group,
        "n_g",
        F.when(F.col("m") >= cap * F.col("n_g"), F.lit(cap).cast("long"))
        .otherwise(F.expr("m div n_g"))
        .alias("whole"),
        F.when(F.col("m") >= cap * F.col("n_g"), F.lit(0).cast("long"))
        .otherwise(F.expr("((m % n_g) * 4294967296) div n_g"))
        .alias("thresh"),
    )
    u32 = F.conv(F.substring(F.md5(k.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    reps = (
        F.col("whole")
        + F.when(F.col("u32") < F.col("thresh"), 1).otherwise(0)
    ).alias("reps")
    r = (
        docs.select(g, k.alias("k"), u32.alias("u32"))
        .join(F.broadcast(fac), group)
        .select(g, "k", reps)
    )
    em = r.select(
        g, "k", F.explode(F.sequence(F.lit(1).cast("long"), F.col("reps"))).alias("copy_idx")
    )
    agg = em.groupBy(group).agg(
        F.count(F.lit(1)).cast("long").alias("n_emitted"),
        F.sum("k").cast("long").alias("sum_ids"),
        F.sum(F.col("k") * F.col("copy_idx")).cast("long").alias("emit_sig"),
    )
    return (
        fac.join(agg, group)
        .select(
            g,
            F.col("n_g").alias("n_before"),
            F.col("whole").alias("whole_epochs"),
            F.col("thresh").alias("extra_thresh"),
            "n_emitted",
            "sum_ids",
            "emit_sig",
        )
    )


def epoch_shard_shuffle(
    df: DataFrame,
    key: str = "doc_id",
    n_shards: int = 8,
    epochs: tuple[int, ...] = (1,),
) -> DataFrame:
    """Deterministic epoch-varying shard-and-shuffle — the dataloader
    prep pass every training pipeline runs: each epoch needs a
    DIFFERENT pseudo-random permutation of the corpus, materialized as
    n_shards ordered shards, and the permutation must be reproducible
    (resume a crashed epoch, re-derive what batch N contained) and
    engine/layout-independent. rand() gives none of that; a per-epoch
    keyed hash gives all of it: ``u32 = md5_u32(epoch || ':' || key)``
    drives BOTH the shard (u32 mod n_shards) and the within-shard
    order (u32, key) — change the epoch and every row draws a fresh
    uniform, so shard membership and order reshuffle; keep the epoch
    and the permutation is bit-stable forever.

    Returns one row per (epoch, input row): ``(epoch, shard, key,
    u32, rank)`` with rank the 1-based position in the shard's order —
    exactly the layout a writer would ``partitionBy(epoch, shard)``
    + sortWithinPartitions. Multiple epochs ride ONE corpus scan (the
    epoch axis is an explode, not a re-read).

    Scale: the per-epoch hash and shard are map-side; the within-shard
    rank is the one genuine shuffle (hash-partition by (epoch, shard),
    sort inside) — which is not overhead but the OUTPUT: materializing
    shuffled shards IS a repartition+sort, and expressing it this way
    lets Spark do it as one exchange instead of a global orderBy (the
    per-shard sorts are independent, n_shards-way parallel).
    """
    k = F.col(key)
    e = F.explode(
        F.array(*[F.lit(int(x)).cast("int") for x in epochs])
    ).alias("epoch")
    rows = df.select(k.alias(key), e)
    u32 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("epoch").cast("string"), F.lit(":"), k.cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    from pyspark.sql import Window

    w = Window.partitionBy("epoch", "shard").orderBy("u32", key)
    return (
        rows.select(
            "epoch",
            k,
            u32.alias("u32"),
        )
        .withColumn("shard", (F.col("u32") % n_shards).cast("int"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("epoch", "shard", key, "u32", "rank")
    )

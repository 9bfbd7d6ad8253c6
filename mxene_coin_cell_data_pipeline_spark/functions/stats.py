"""Distributed exact order statistics.

Spark's exact ``median``/``percentile`` aggregates buffer EVERY value
into a ``TypedImperativeAggregate`` and merge the buffers on one final
task — fine at thousands of rows per group, impossible at 100 TB (the
buffer IS the column). ``percentile_approx`` is the documented trade
when exactness is negotiable; when it is not (billing, SLAs, QC
gates), the classic scalable answer is **two-pass bucketed
selection**:

1. one parallel scan → (min, max, count);
2. one parallel scan → histogram of ~4k equal-width buckets, cumulate
   driver-side (4k longs — trivial), locate the bucket(s) holding the
   target rank(s);
3. one parallel scan filtered to those buckets (expected n/4k of the
   data, pushed down to the parquet scan) → the handful of candidate
   values sort driver-side; interpolate exactly like
   ``percentile_cont``.

Three full-parallel scans, no shuffle wider than 4k rows, nothing
single-node beyond kilobytes — the plan shape survives any scale the
scans survive. Degenerate distributions (one bucket holding almost
everything, i.e. massive ties) shortcut: a constant-valued bucket needs
no pass 3.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def exact_quantiles_2pass(
    df: DataFrame,
    col: str,
    qs: list[float],
    n_buckets: int = 4096,
    max_candidates: int = 5_000_000,
) -> dict[float, float]:
    """Exact interpolated quantiles (``percentile_cont`` semantics) of
    ``df[col]`` computed by bucketed selection. Returns {q: value}.

    Driver-side state is O(n_buckets + candidates); raises if a
    pathological distribution would pull more than ``max_candidates``
    rows into pass 3 (recursing into the bucket is the production
    fallback; the synthetic tables never trigger it).
    """
    v = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    st = v.agg(
        F.min("v").alias("lo"), F.max("v").alias("hi"), F.count("v").alias("n")
    ).collect()[0]
    n = int(st["n"])
    if n == 0:
        return {q: float("nan") for q in qs}
    lo, hi = float(st["lo"]), float(st["hi"])
    if lo == hi:
        return {q: lo for q in qs}

    # percentile_cont rank targets, 1-based: h = (n-1)q + 1
    ranks: set[int] = set()
    targets: dict[float, tuple[int, float]] = {}
    for q in qs:
        h = (n - 1) * q + 1.0
        k = int(math.floor(h))
        frac = h - k
        ranks.add(k)
        if frac > 0:
            ranks.add(k + 1)
        targets[q] = (k, frac)

    width = (hi - lo) / n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1), F.floor((F.col("v") - lo) / width).cast("int")
    )
    hist = dict(
        (r["b"], r["c"])
        for r in v.groupBy(bucket.alias("b")).agg(F.count("v").alias("c")).collect()
    )

    # locate the bucket of each target rank via the cumulative histogram
    need: dict[int, int] = {}  # bucket -> rank offset base (rows before it)
    cum = 0
    it = iter(sorted(hist))
    rank_list = sorted(ranks)
    ri = 0
    for b in sorted(hist):
        c = hist[b]
        while ri < len(rank_list) and cum < rank_list[ri] <= cum + c:
            need.setdefault(b, cum)
            ri += 1
        cum += c
    assert ri == len(rank_list), "rank location failed"

    n_cand = sum(hist[b] for b in need)
    if n_cand > max_candidates:
        raise ValueError(
            f"{n_cand} candidate rows exceed max_candidates; "
            "recurse into the bucket for such distributions"
        )
    # pass 3 filters on the SAME bucket expression as pass 2 (a value
    # range would disagree with it at float bucket boundaries)
    rows = (
        v.select("v", bucket.alias("b"))
        .filter(F.col("b").isin([int(b) for b in need]))
        .collect()
    )

    # global rank -> value: ranks are contiguous within one bucket,
    # starting after the rows below it (the cumulative base)
    by_rank: dict[int, float] = {}
    for b in sorted(need):
        in_b = sorted(r["v"] for r in rows if r["b"] == b)
        base = need[b]
        for i, x in enumerate(in_b, start=1):
            by_rank[base + i] = x

    out: dict[float, float] = {}
    for q, (k, frac) in targets.items():
        vk = by_rank[k]
        # lerp form matches DuckDB quantile_cont bit-for-bit (the
        # lo + (hi-lo)*frac association differs in the last ulp)
        out[q] = vk if frac == 0 else vk * (1.0 - frac) + by_rank[k + 1] * frac
    return out


def cms_bucket(key, j, w: int, hash_fn: str = "xxhash64"):
    """Count-min-sketch cell index for ``key`` in hash row ``j`` of a
    ``w``-bucket sketch.

    ``hash_fn`` (t07's discipline): ``xxhash64`` (default) keys the
    row off seeded JVM xxhash64 — the production path, one int64 op
    per occurrence with no hex materialization; ``md5`` derives the
    bucket from the first 8 md5 hex chars of ``"<j>:<key>"`` —
    byte-identical in any engine with md5, the a28 oracle
    configuration.
    """
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(j.cast("long"), key), F.lit(w))
    if hash_fn == "md5":
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", j.cast("string"), key)), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % w
        )
    raise ValueError(f"unknown hash_fn: {hash_fn}")


def countmin_cells(
    df: DataFrame,
    key_col: str,
    d: int = 3,
    w: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Build the d×w count-min sketch of ``key_col`` occurrences as
    ``(j, bucket, cell_n)`` rows — the mergeable frequency sketch:
    cells from different partitions, days, or streaming batches merge
    BY ADDITION, and any key's frequency estimate is
    ``min_j(cell[j][bucket_j(key)])`` (one-sided: est ≥ exact,
    overshoot bounded by colliding mass ~ n/w per row).

    Plan: one explode over the d hash rows and one (j, bucket)
    groupBy — map-side combined into at most d·w partial rows per
    task, so at 100 TB the sketch build rides the scan stage and the
    shuffle carries O(d·w) rows per partition regardless of corpus
    size.
    """
    spark = df.sparkSession
    js = spark.range(d).select(F.col("id").cast("int").alias("j"))
    return (
        df.select(F.col(key_col).alias("_k"))
        .crossJoin(F.broadcast(js))
        .select("j", cms_bucket(F.col("_k"), F.col("j"), w, hash_fn).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_n"))
    )

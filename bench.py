"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_headline_query_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": X}

Each query is executed to completion via the ``noop`` sink (full
materialization of EVERY output column, no result shipping overhead).
``count()`` is NOT used: Catalyst prunes cardinality-preserving work
under a count — a windowed projection with no downstream filter would
measure as a bare scan. A warmup pass on the smallest table absorbs
JVM/codegen startup so the numbers measure the plans, not the JIT.

Each query is measured as the MIN of N interleaved full passes
(default 3, $SPARK_GRAFT_BENCH_PASSES; any value >= 1 is honored, so
a deliberate single-pass smoke run costs one pass). Before the timed
passes, ONE untimed warmup pass runs at the bench SF itself (r09's
stamped per-pass totals 55.7/59.4/46.0 were warmup-shaped — the
sf0.001 warmup compiles codegen but does not touch the sf0.1 parquet
page cache or the size-tiered JIT); its wall time is stamped as
``warmup_pass_sec``. Skip it with $SPARK_GRAFT_BENCH_NO_WARMUP=1.
SCALING.md ("Round 4:
bench-noise audit") measured four same-code full runs within one
session spreading 93.5-141.7s with single-query transients up to 46x
(t06: 0.67s / 31.1s / 0.9s isolated), caused by host-level
interference, not the plans; round 8 then measured four IDLE-host
runs of an unchanged plan set spreading 1.46x under min-of-2. Min
over ≥3 interleaved passes converges each query to its floor (a
transient must hit the same query in every pass to survive) while
remaining an honest per-plan cost: every reported number is a time
the full query actually took, cold-cache effects are already
absorbed by the warmup pass. The per-pass headline totals and their
spread are stamped into the artifact — read any committed headline
against its own spread before calling a delta a regression.

Round-12 protocol changes (both are measurement-honesty fixes, called
out per the optimization brief; the OLD numbers live on in the
committed BENCH_r* series and OPTIMIZATION_r12.md keeps both):

- ``spark.catalog.clearCache()`` runs after EVERY query execution
  (warmup and timed, outside the timed window). Several operators
  legitimately ``persist()`` a reused intermediate within one query
  plan (guide §5); because Spark's CacheManager matches canonicalized
  plans ACROSS invocations, a timed pass would otherwise read
  intermediates materialized during the untimed warmup (and one query
  could read a twin's cache within a pass) — result caching in effect,
  even though each persist is a within-query optimization. Clearing
  between executions makes every timed number a full recompute from
  the parquet inputs, and bounds the session's cache growth.
- The final stdout JSON line now carries a ``queries`` map (the r01
  contract) with the 58 headline entries plus a PINNED list of the
  heaviest extended entries, values rounded to 2 decimals. The r05
  full-map line blew the driver's ~2000-byte tail capture (parsed:
  null); this subset is sized to fit with slack, and informational
  fields are dropped before query entries if the line ever overflows.
  The full 3-decimal map for all entries stays in BENCH_DETAIL.json
  and on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mxene_coin_cell_data_pipeline_spark import get_spark  # noqa: E402
from mxene_coin_cell_data_pipeline_spark.plans import QUERIES  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q05_nation_volume",
    "w01_rank_per_group",
    "a02_last_non_null",
    "a05_trapezoid",
    "a07_neighbor_median_delta",
    "a11_regr_fade",
    "qc01_aggregate_checks",
    "p01_cycler_pipeline",
    "d01_exact_dedup",
    "d02_minhash_lsh",
    "d05_ngram_jaccard",
    "d03_simhash",
    "d04_embedding_neardup",
    "s01_cosine_topk",
    "s02_ivf_topk",
    "t01_token_stats",
    "t03_language_id",
    "m01_binary_meta",
    "j01_semi_join",
    "e03_range_join",
    "s04_knn_join",
    "t06_top_bigrams",
    "m03_frame_sample",
    "e04_resample_ffill",
    "w06_range_frame",
    "d07_signlsh_neardup",
    "t07_winnow_fingerprint",
    "a17_quantile_2pass",
    "j05_correlated_avg",
    "j06_disjunctive_join",
    "j07_waiting_supplier",
    "o06_stratified_sample",
    "o07_latest_by_key",
    "j08_salted_skew_agg",
    "m04_byte_features",
    "s05_kmeans_iteration",
    "w09_cube",
    "q10_returned_revenue",
    "j09_group_vs_global",
    "a19_priority_counts",
    "t08_repetition_metrics",
    "d10_chunk_dedup",
    "e05_ewma",
    "e06_interval_coverage",
    "o08_weighted_sample",
    "o09_zorder_layout",
    "q06_forecast_revenue",
    "q08_market_share",
    "d11_url_dedup",
    "g01_pagerank",
    "e08_spatial_join",
    "e09_running_distinct",
    "o12_cohort_retention",
    "c15_map_column_ops",
    "j12_nullsafe_join",
    "s06_label_centroids",
]

#: round-5 additions: the wave-3/4 heavies — the most expensive new
#: plans get tracked perf history so a regression in the capped LSH
#: chain, the export capstone, or the codec legs is visible round to
#: round. Kept in a separate list so the headline total stays
#: comparable to the round-1 58-query pin (BASELINE.md): the JSON line
#: reports the 58-query total as "value" and the extended set under
#: "value_extended" / per-query times alongside.
EXTENDED = [
    "d12_lsh_star_cap",
    "d14_star_cap_groups",
    "p05_export_pipeline",
    "g02_connected_components",
    "g03_triangle_count",
    "t17_span_self_dedup",
    "t18_bm25_topk",
    "s08_semdedup",
    "s10_pca_power",
    "m05_ppm_decode",
    "m07_wav_decode",
    "m08_avi_frames",
    "st09_stream_decode",
    "st10_stream_histogram",
    # round-8 wave 6: perf history from birth for the new operators
    "d17_window_duprate",
    "d18_incremental_dedup",
    "t19_bpe_top_merges",
    "t20_inverted_index",
    "s11_pq_assign",
    "st11_stream_incremental_dedup",
    "s12_random_projection",
    "m09_avi_keyframes",
    "d19_containment_pairs",
    "src06_schema_evolution",
    "t21_bigram_lm_score",
    "o17_merge_upsert",
    "j14_dynamic_partition_pruning",
    "m10_image_ahash_neardup",
    "t22_token_drift",
    # round-9 wave 10: perf history from birth for the new operators
    "d20_crossdoc_span_removal",
    "m11_image_phash_neardup",
    "o18_source_mix_quota",
    "t23_bpe_encode",
    # round-10 wave 11: perf history from birth for the new operators
    "s13_pq_adc_topk",
    "m12_video_phash_neardup",
    "t24_bpe_train_merges",
    "p06_tokenizer_corpus_pipeline",
    # round-11 wave 12: perf history from birth for the new operators
    "s14_ivfpq_residual_topk",
    "m13_audio_fingerprint_neardup",
    "s15_rrf_hybrid_fusion",
    "p07_trained_tokenizer_pipeline",
    # round-11 wave 13: perf history from birth for the new operators
    "src07_ivf_index_layout",
    "s16_mmr_diverse_topk",
    "o19_epoch_upsample",
    "o20_epoch_shard_shuffle",
    "d21_quality_keeper_groups",
    "s17_mmr_over_ivfadc",
    "g04_label_propagation",
]

#: Entries whose per-query seconds ride the final STDOUT line (r12,
#: VERDICT r11 item 2 — driver-visible per-query history): the 58
#: headline queries plus this PINNED subset of the heaviest extended
#: entries. Pinned and append-only (the driver diffs names round over
#: round; removing one reads as a dropped query) and sized so the
#: whole line stays inside the driver's ~2000-byte tail capture —
#: the full map for every entry is in BENCH_DETAIL.json.
STDOUT_EXTRA = [
    "p07_trained_tokenizer_pipeline",
    "g04_label_propagation",
    "g02_connected_components",
    "st10_stream_histogram",
    "t24_bpe_train_merges",
    "p06_tokenizer_corpus_pipeline",
    "st11_stream_incremental_dedup",
    "d19_containment_pairs",
]


def _bench_only() -> dict:
    """Production-path perf twins (VERDICT r05 task 7): the xxhash64
    defaults of the library functions whose REGISTERED queries pin the
    md5 oracle knob (d02/d06/a28/t11). Bench-only — not registry
    entries (xxhash64 is JVM-only, so DuckDB cannot hash-match the
    exact pair/bucket sets; correctness of the shared kernels is pinned
    by the md5 twins' oracles plus tests/test_hash_modes.py) — so
    the perf the library actually ships is tracked by BENCH history,
    not only tools/measure_hash_modes.py."""
    from pyspark.sql import functions as F

    from mxene_coin_cell_data_pipeline_spark.functions.dedup import (
        closure_audit,
        minhash_near_dup_pairs,
        near_dup_groups,
    )
    from mxene_coin_cell_data_pipeline_spark.functions.stats import cms_bucket
    from mxene_coin_cell_data_pipeline_spark.functions.text import hashed_features
    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    def d02_xxh(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        # library defaults: hash_fn="xxhash64", bucket_cap=64 star emission
        return minhash_near_dup_pairs(docs, threshold=0.8)

    def d06_xxh(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        # same registered audit shape as d06, library-default hashing
        return closure_audit(
            near_dup_groups(minhash_near_dup_pairs(docs, threshold=0.8))
        )

    def a28_xxh(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        vocab = (
            docs.select(
                F.explode(
                    F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z0-9]+"), 0)
                ).alias("token")
            )
            .groupBy("token")
            .agg(F.count("*").alias("n"))
        )
        js = spark.range(3).select(F.col("id").cast("int").alias("j"))
        tb = vocab.crossJoin(F.broadcast(js)).withColumn(
            "bucket", cms_bucket(F.col("token"), F.col("j"), 32)
        )
        cells = tb.groupBy("j", "bucket").agg(F.sum("n").alias("cell_n"))
        return (
            tb.join(F.broadcast(cells), ["j", "bucket"])
            .groupBy("token")
            .agg(F.min("cell_n").alias("cms_n"), F.max("n").alias("exact_n"))
        )

    def t11_xxh(spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        return hashed_features(docs, n_dims=256)

    def d17_xxh(spark, sf_dir):
        from mxene_coin_cell_data_pipeline_spark.functions.dedup import (
            window_dup_rate,
        )

        docs = load_table(spark, sf_dir, "documents")
        # production knob: 8-byte gram hash on the wire, not the string
        return window_dup_rate(docs, k=8, gram_key="xxhash64")

    def d18_xxh(spark, sf_dir):
        from mxene_coin_cell_data_pipeline_spark.functions.dedup import (
            incremental_minhash_dedup,
        )

        docs = load_table(spark, sf_dir, "documents")
        # library defaults: hash_fn="xxhash64", corpus bucket_cap=64
        return incremental_minhash_dedup(docs, batch_mod=5, threshold=0.8)

    return {
        "d02_minhash_lsh_xxh": d02_xxh,
        "d06_near_dup_groups_xxh": d06_xxh,
        "a28_countmin_freq_xxh": a28_xxh,
        "t11_feature_hashing_xxh": t11_xxh,
        "d17_window_duprate_xxh": d17_xxh,
        "d18_incremental_dedup_xxh": d18_xxh,
    }


#: 1-min loadavg above which the host is considered busy. The bench
#: saturates all cores itself, so the guard only looks at load from
#: OTHER work, *before* the session starts. BENCH_r06's 61.9s headline
#: was recorded while a 100x oracle sweep ran on the same host and the
#: pollution entered the perf history silently; this makes that
#: structural: the bench WAITS (bounded) for the host to drain, and
#: unconditionally stamps the load it actually measured under into
#: both the detail file and the headline JSON.
BUSY_LOADAVG = 4.0
#: Wait-until-idle budget. Round 7's committed headline (65.8s) was
#: recorded after the old 300s cap expired while a 100x sweep still
#: held all 32 cores (loadavg 32) — the guard stamped honestly but the
#: series entry was still polluted. 30 min outlasts any single
#: co-scheduled sweep batch, so the committed series is load-clean by
#: construction; the stamp fields below remain the audit trail for the
#: (now pathological) case where even 30 min wasn't enough.
BUSY_WAIT_S = 1800


def _host_guard() -> dict:
    waited = 0
    load = os.getloadavg()[0]
    while load > BUSY_LOADAVG and waited < BUSY_WAIT_S:
        print(
            f"[bench] host busy (loadavg {load:.1f} > {BUSY_LOADAVG}); "
            f"waiting... ({waited}s/{BUSY_WAIT_S}s)",
            file=sys.stderr,
        )
        time.sleep(15)
        waited += 15
        load = os.getloadavg()[0]
    return {
        "host_loadavg_1m_at_start": round(load, 2),
        "host_busy_at_start": load > BUSY_LOADAVG,
        "host_wait_s": waited,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    host = _host_guard()
    spark = get_spark("mxene-bench")

    # warmup: JVM + parquet footer caches + the Python worker pool
    # (fork + numpy/pandas import per core) + whole-stage-codegen
    # compilation of every headline plan shape (janino caches generated
    # classes by source, so running each query once at the smallest SF
    # compiles exactly the code the measured run reuses). One-time
    # session costs; the measured numbers are the plans, not the JIT.
    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    region.count()
    region.repartition(int(spark.conf.get("spark.sql.shuffle.partitions"))).mapInPandas(
        lambda it: it, schema=region.schema
    ).count()

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Cache honesty (r12, VERDICT r11 item 1): drop every SQL-cached
    # relation once a query's action completes, so the NEXT execution —
    # warmup or timed — recomputes from parquet instead of reading
    # intermediates a previous invocation persisted (CacheManager
    # matches canonicalized plans across invocations). Called OUTSIDE
    # the timed window: timers stop before cleanup runs.
    def clear_cache() -> None:
        spark.catalog.clearCache()

    bench_only = _bench_only()
    fns = {name: QUERIES[name].spark for name in HEADLINE + EXTENDED}
    fns.update(bench_only)

    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf):
        for fn in fns.values():
            try:
                run(fn(spark, warm_sf))
            except Exception:
                pass  # a warmup failure must never sink the bench
            clear_cache()

    # ≥3 interleaved passes, min per query (VERDICT r08 task 4): the
    # committed series was sampling co-tenant weather — four same-day
    # idle runs of an UNCHANGED plan set spread 43.76-63.98s (1.46×)
    # under min-of-2, swamping any plan signal. More passes converge
    # each query to its floor (a transient must now hit the same query
    # in EVERY pass to survive); the per-pass headline totals are
    # stamped into the artifact so the intra-RUN spread is part of the
    # record — read a committed headline against that spread before
    # calling anything a regression.
    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    times: dict[str, float] = {}
    pass_totals: list[float] = []

    # one UNTIMED warmup pass at the bench SF (VERDICT r09 task 6):
    # the sf0.001 warmup above compiles every plan's codegen, but the
    # first sf0.1 pass still pays parquet page-cache faults and the
    # size-tiered JIT — r09's stamped spread 1.292 (55.7/59.4/46.0)
    # was exactly that shape. Timed separately so the artifact shows
    # what the warmup absorbed.
    # A warmup failure must never sink the bench, but it must not be
    # SILENT either (r10 ADVICE): a query that raises only during
    # warmup would otherwise leave no trace while its timed pass
    # silently lost the warm state this pass exists to provide — so
    # the failing names are stamped into the artifact.
    # The r10-item-4 diagnosis RAN (round 11, idle host): the spread
    # DECAYS WITH EXECUTIONS — 1.292 at 0 warmups (r09), 1.226 at 1
    # (r10), 1.152 at 2 (BENCH_DETAIL warmups 118.7/112.1s, pass
    # totals 46.1/40.0/40.3) — which is tiered-JIT behavior (C2
    # recompilation thresholds are counted in EXECUTIONS of the
    # generated classes), not page cache (every parquet page was hot
    # after warmup 1, yet warmup 2 still moved the spread). Default is
    # therefore TWO warmup passes; the residual ~15% on pass 1 is the
    # tail of the same tiering (some plans need >2 executions to reach
    # C2) and is absorbed by min-per-query.
    # SPARK_GRAFT_BENCH_WARMUP_PASSES overrides for re-diagnosis.
    warmup_pass_sec = None
    warmup_pass_secs: list[float] = []
    warmup_failures: list[str] = []
    n_warmup = (
        0
        if os.environ.get("SPARK_GRAFT_BENCH_NO_WARMUP")
        else max(1, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP_PASSES", "2")))
    )
    for _w in range(n_warmup):
        t0 = time.perf_counter()
        for name, fn in fns.items():
            try:
                run(fn(spark, sf_dir))
            except Exception:
                if name not in warmup_failures:
                    warmup_failures.append(name)
            clear_cache()
        warmup_pass_secs.append(round(time.perf_counter() - t0, 3))
    if warmup_pass_secs:
        warmup_pass_sec = warmup_pass_secs[0]
    for _pass in range(n_passes):
        pass_t: dict[str, float] = {}
        for name, fn in fns.items():
            t0 = time.perf_counter()
            run(fn(spark, sf_dir))
            elapsed = round(time.perf_counter() - t0, 3)
            clear_cache()
            pass_t[name] = elapsed
            if name not in times or elapsed < times[name]:
                times[name] = elapsed
        pass_totals.append(round(sum(pass_t[n] for n in HEADLINE), 3))

    # "value" stays the ORIGINAL 58-query headline total — directly
    # comparable to the round-1 pin in BASELINE.md; the wave-3/4
    # heavies and the xxh production twins report separately so their
    # history is tracked without making the headline series
    # incomparable across rounds.
    total = round(sum(times[n] for n in HEADLINE), 3)
    total_ext = round(sum(times[n] for n in EXTENDED), 3)
    total_xxh = round(sum(times[n] for n in bench_only), 3)

    # Output protocol (VERDICT r05 task 3): the per-query map blew the
    # driver's tail capture in r05 (BENCH_r05.json parsed: null), so
    # the map goes to a committed detail file and stderr, and the LAST
    # stdout line is a COMPACT headline JSON the driver can always
    # parse from a bounded tail.
    detail = {
        "metric": "total_headline_query_sec",
        "value": total,
        "unit": "sec",
        "value_extended_wave34_sec": total_ext,
        "value_bench_only_xxh_sec": total_xxh,
        "n_headline": len(HEADLINE),
        "n_extended": len(EXTENDED),
        "n_bench_only": len(bench_only),
        "n_passes": n_passes,
        "warmup_pass_sec": warmup_pass_sec,
        "warmup_pass_secs": warmup_pass_secs,
        "warmup_failures": warmup_failures,
        "pass_headline_totals": pass_totals,
        "intra_run_spread": round(max(pass_totals) / min(pass_totals), 3),
        "queries": times,
        "sf": sf,
        **host,
    }
    detail_file = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
    )
    with open(detail_file, "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps({"per_query_detail": detail_file, "queries": times}), file=sys.stderr)
    # Final stdout line (r12 protocol): the compact headline JSON the
    # driver parses from a bounded (~2000 byte) output tail, now
    # carrying per-query seconds for HEADLINE + STDOUT_EXTRA (2-decimal
    # — full precision in the detail file). If the line ever outgrows
    # the budget, informational fields are dropped first; query entries
    # are never dropped.
    stdout_obj = {
        "metric": "total_headline_query_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries": {
            n: round(times[n], 2) for n in HEADLINE + STDOUT_EXTRA if n in times
        },
        "value_extended_wave34_sec": total_ext,
        "value_bench_only_xxh_sec": total_xxh,
        "n_passes": n_passes,
        "warmup_pass_sec": warmup_pass_sec,
        "intra_run_spread": round(max(pass_totals) / min(pass_totals), 3),
        "detail": os.path.basename(detail_file),
        **host,
    }
    line = json.dumps(stdout_obj, separators=(",", ":"))
    for drop in (
        "host_wait_s",
        "host_busy_at_start",
        "host_loadavg_1m_at_start",
        "warmup_pass_sec",
        "n_passes",
        "intra_run_spread",
    ):
        if len(line) <= 1900:
            break
        stdout_obj.pop(drop, None)
        line = json.dumps(stdout_obj, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()

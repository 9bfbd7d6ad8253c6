"""Measure wave-6 query scale behavior: sf0.1 vs the 10× perturbed
replication corpus (tools/gen_10x.py output).

Usage: python tools/measure_wave6.py [ten_x_dir]
Prints a markdown table row per query: t(1x), t(10x), ratio, rows(10x).
Timings are min-of-2 noop-sink runs after an sf0.001 warmup, matching
bench.py's discipline.
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mxene_coin_cell_data_pipeline_spark import get_spark  # noqa: E402
from mxene_coin_cell_data_pipeline_spark.plans import QUERIES  # noqa: E402

WAVE6 = [
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
]


def main() -> None:
    ten_x = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
    spark = get_spark("wave6-scale")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def best_of_2(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(QUERIES[name].spark(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        return best

    for name in WAVE6:
        run(QUERIES[name].spark(spark, "/root/testdata/sf0.001"))  # warmup
    print("| query | 1× (sf0.1) | 10× | ratio | rows 10× |")
    print("|---|---|---|---|---|")
    for name in WAVE6:
        t1 = best_of_2(name, "/root/testdata/sf0.1")
        t10 = best_of_2(name, ten_x)
        rows = QUERIES[name].spark(spark, ten_x).count()
        print(
            f"| {name} | {t1:.2f}s | {t10:.2f}s | "
            f"{t10 / t1:.1f}× | {rows} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

"""Measure wave-4 query scale behavior: sf0.1 vs the 10× perturbed
replication corpus (tools/gen_10x.py output).

Usage: python tools/measure_wave4.py [ten_x_dir]
Prints a markdown table row per query: t(1x), t(10x), ratio.
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

WAVE4 = [
    "m07_wav_decode",
    "t17_span_self_dedup",
    "t18_bm25_topk",
    "a27_histogram_quantile",
    "s09_matryoshka_topk",
    "g03_triangle_count",
    "e15_scd2_intervals",
]


def main() -> None:
    ten_x = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x_w3"
    spark = get_spark("wave4-scale")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def best_of_2(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(QUERIES[name].spark(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        return best

    for name in WAVE4:
        run(QUERIES[name].spark(spark, "/root/testdata/sf0.001"))  # warmup
    print("| query | 1× (sf0.1) | 10× | ratio |")
    print("|---|---|---|---|")
    for name in WAVE4:
        t1 = best_of_2(name, "/root/testdata/sf0.1")
        t10 = best_of_2(name, ten_x)
        print(f"| {name} | {t1:.2f}s | {t10:.2f}s | {t10 / t1:.1f}× |")
    spark.stop()


if __name__ == "__main__":
    main()

"""Measure round-9 wave-10 query scale behavior: sf0.1 vs the 10×
perturbed replication corpus (tools/gen_10x.py output).

Usage: python tools/measure_wave10.py [--ten-x DIR] [name ...]
Prints a markdown table row per query: t(1x), t(10x), ratio, rows(10x).
Timings are min-of-2 noop-sink runs after an sf0.001 warmup, matching
bench.py's discipline. Defaults to the wave-10 set.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from mxene_coin_cell_data_pipeline_spark import get_spark  # noqa: E402
from mxene_coin_cell_data_pipeline_spark.plans import QUERIES  # noqa: E402

WAVE10 = [
    "d20_crossdoc_span_removal",
    "m11_image_phash_neardup",
    "o18_source_mix_quota",
    "t23_bpe_encode",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ten-x", default="/tmp/sf1x")
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    names = args.names or WAVE10
    spark = get_spark("wave10-scale")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def best_of_2(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run(QUERIES[name].spark(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        return best

    for name in names:
        run(QUERIES[name].spark(spark, "/root/testdata/sf0.001"))  # warmup
    print("| query | 1× (sf0.1) | 10× | ratio | rows 10× |")
    print("|---|---|---|---|---|")
    for name in names:
        t1 = best_of_2(name, "/root/testdata/sf0.1")
        t10 = best_of_2(name, args.ten_x)
        rows = QUERIES[name].spark(spark, args.ten_x).count()
        print(
            f"| {name} | {t1:.2f}s | {t10:.2f}s | "
            f"{t10 / t1:.1f}× | {rows} |",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

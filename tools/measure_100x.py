"""Measure headline queries at 1x (sf0.1) vs 100x (/tmp/sf100x,
perturbed replication via tools/gen_10x.py with factor 100) — the
"scale proof beyond 10x" SCALING.md previously lacked.

Protocol mirrors bench.py: noop sink (full materialization of every
output column), warmup pass at sf0.001 to absorb JVM/codegen startup,
best-of-2 interleaved passes per (query, scale) to suppress the host
noise SCALING.md's round-4 audit measured. Queries chosen to span the
plan families whose 100 TB behavior matters (scan-agg, snowflake
join, dedup shuffle, capped LSH emission + closure, sessionize
window, skew-salted agg, two-pass quantile, IVF ANN, curation
funnel); the known superlinear-by-design pair paths (d05 exact
inverted index) are excluded — their growth law is already measured
and documented at 10x.

Usage: python tools/measure_100x.py [--scales 1,100] [--out file]
Prints one JSON line per query: {name, sec_1x, sec_100x, ratio}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mxene_coin_cell_data_pipeline_spark import get_spark  # noqa: E402
from mxene_coin_cell_data_pipeline_spark.plans import QUERIES  # noqa: E402

MEASURE = [
    "q01_pricing_summary",
    "q05_nation_volume",
    "q06_forecast_revenue",
    "a05_trapezoid",
    "a17_quantile_2pass",
    "w01_rank_per_group",
    "j08_salted_skew_agg",
    "o07_latest_by_key",
    "e02_sessionize",
    "d01_exact_dedup",
    "d12_lsh_star_cap",
    "d14_star_cap_groups",
    "t01_token_stats",
    "t13_curation_funnel",
    "s02_ivf_topk",
]

SCALE_DIRS = {1: "/root/testdata/sf0.1", 100: "/tmp/sf100x"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,100")
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    names = [n for n in args.only.split(",") if n] or MEASURE

    spark = get_spark("measure-100x")

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    for name in names:  # codegen warmup
        try:
            run(QUERIES[name].spark(spark, "/root/testdata/sf0.001"))
        except Exception:
            pass

    results = []
    for name in names:
        row: dict = {"query": name}
        for scale in scales:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                run(QUERIES[name].spark(spark, SCALE_DIRS[scale]))
                dt = time.perf_counter() - t0
                best = dt if best is None or dt < best else best
            row[f"sec_{scale}x"] = round(best, 2)
        if len(scales) == 2:
            a, b = (row[f"sec_{s}x"] for s in scales)
            row["ratio"] = round(b / a, 1) if a > 0 else None
        print(json.dumps(row), flush=True)
        results.append(row)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

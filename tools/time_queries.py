"""Time named queries in isolation through the noop sink (guide §1.4).

Usage: python tools/time_queries.py --only a,b,c [--sf DIR] [--passes 3]
       [--warmups 2]

Same methodology as bench.py (untimed warmups at the target SF, min of
N interleaved passes, noop sink so every output column materializes)
but restricted to a named subset, for tight optimize-measure loops.
Prints one JSON line {name: min_sec}.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", required=True)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--warmups", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("time-queries")
    names = [n.strip() for n in args.only.split(",") if n.strip()]

    def run(name: str) -> None:
        spark.sparkContext.setJobDescription(name)
        QUERIES[name].spark(spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
        spark.sparkContext.setJobDescription(None)

    for _ in range(args.warmups):
        for name in names:
            run(name)
            spark.catalog.clearCache()  # bench.py cache-honesty parity
    times: dict[str, float] = {}
    per_pass: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.passes):
        for name in names:
            t0 = time.perf_counter()
            run(name)
            el = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()  # outside the timed window
            per_pass[name].append(el)
            if name not in times or el < times[name]:
                times[name] = el
    print(json.dumps({"min": times, "passes": per_pass}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

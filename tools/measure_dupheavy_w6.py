"""Dup-heavy adversarial measurement for the round-8 dedup additions:

- d17 window_dup_rate: a boilerplate cluster of m identical docs puts
  m rows into each shared gram's window partition — the claim is
  LINEAR cost in m (no gram self-join), so 10× corpus ≈ 10× time.
- d18 incremental probe: a batch boilerplate doc band-collides with
  the ENTIRE corpus-side cluster; the uncapped probe verifies
  ~0.8m candidates per batch cluster doc (0.16m² pairs total —
  quadratic in cluster size), while bucket_cap=8 bounds it to 8 per
  bucket (linear). Both the match volume and the time make the trade
  visible.

Corpus grows 10× between rows (cluster AND background together), the
measure_dupheavy discipline. Usage: python tools/measure_dupheavy_w6.py
Prints one JSON line per (scale, op, mode) for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mxene_coin_cell_data_pipeline_spark import get_spark  # noqa: E402
from mxene_coin_cell_data_pipeline_spark.functions.dedup import (  # noqa: E402
    incremental_minhash_dedup,
    window_dup_rate,
)
from measure_dupheavy import BOILER, corpus  # noqa: E402


def main() -> None:
    spark = get_spark(
        "dupheavy-w6", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 8))
    )
    for scale in (1, 10):
        docs, m, n_bg = corpus(spark, scale)
        docs = docs.localCheckpoint(eager=True)

        t0 = time.perf_counter()
        n_rows = window_dup_rate(docs, k=8, gram_key="xxhash64").count()
        t_d17 = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "op": "d17_window_duprate",
                    "scale": scale,
                    "cluster_m": m,
                    "rows": n_rows,
                    "sec": round(t_d17, 2),
                }
            ),
            flush=True,
        )

        for mode, cap in (("capped8", 8), ("uncapped", None)):
            t0 = time.perf_counter()
            out = incremental_minhash_dedup(
                docs, batch_mod=5, threshold=0.8, bucket_cap=cap
            )
            agg = out.groupBy().sum("n_matches").collect()[0][0] or 0
            t_d18 = time.perf_counter() - t0
            print(
                json.dumps(
                    {
                        "op": "d18_incremental_dedup",
                        "mode": mode,
                        "scale": scale,
                        "cluster_m": m,
                        "total_matches": int(agg),
                        "sec": round(t_d18, 2),
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()

"""Measure the hash-family cost in the d12-shaped capped MinHash chain:
md5 (oracle/parity configuration) vs xxhash64 (production default) at
10x corpus (/tmp/sf1x — regenerate with tools/gen_10x.py).

md5 was the dominant per-row cost in the round-4 100x profile of
d02/d12 (~3k docs/s); round 5 made xxhash64 the library default with
md5 the explicit oracle knob. This prints the before/after row for
SCALING.md.

Usage: python tools/measure_hash_modes.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mxene_coin_cell_data_pipeline_spark import get_spark  # noqa: E402
from mxene_coin_cell_data_pipeline_spark.functions.dedup import (  # noqa: E402
    minhash_near_dup_pairs,
)
from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
    spark = get_spark("hashmodes", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    for hash_fn in ("md5", "xxhash64"):
        t0 = time.time()
        n_pairs = minhash_near_dup_pairs(
            docs, threshold=0.8, bucket_cap=64, hash_fn=hash_fn
        ).count()
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_docs": n_docs,
                    "hash_fn": hash_fn,
                    "pairs": n_pairs,
                    "sec": round(dt, 2),
                    "docs_per_sec": round(n_docs / dt),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()

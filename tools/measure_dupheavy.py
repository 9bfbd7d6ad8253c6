"""Measure candidate-edge volume & time on a duplicate-heavy corpus:
uncapped all-pairs LSH emission vs the bucket_cap star-edge path.

The adversarial shape is one boilerplate cluster of m identical docs
(web scale: a viral page replicated across sites). Uncapped emission
is m(m-1)/2 pairs from every band; the cap emits m-1 star edges.
Corpus grows 10x between the two rows (cluster AND background scale
together), so linear paths show ~10x and quadratic paths ~100x.

Usage: python tools/measure_dupheavy.py
Prints one JSON line per (scale, mode) for SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mxene_coin_cell_data_pipeline_spark import get_spark  # noqa: E402
from mxene_coin_cell_data_pipeline_spark.functions.dedup import (  # noqa: E402
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)

BOILER = (
    "subscribe to our newsletter for the latest updates terms of service "
    "privacy policy all rights reserved copyright two thousand twenty four "
    "follow us on social media contact support for assistance"
)


def corpus(spark, scale: int):
    m = 200 * scale  # boilerplate cluster size
    n_bg = 1800 * scale  # distinct background docs
    rows = [(i, BOILER) for i in range(m)]
    rows += [
        (
            10_000_000 + i,
            f"unique background document {i} discussing subject {i * 13} "
            f"with vocabulary token{i} and detail {i * 7} entry {i % 97}",
        )
        for i in range(n_bg)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), m, n_bg


def main() -> None:
    spark = get_spark("dupheavy", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    cap = 8
    for scale in (1, 10):
        docs, m, n_bg = corpus(spark, scale)
        sig = minhash_signatures(shingles(docs)).localCheckpoint(eager=True)
        # bucket_cap=None must be EXPLICIT since round 5 made the
        # star-capped emission the library default
        for mode, kwargs in (
            ("uncapped", {"bucket_cap": None}),
            (f"cap{cap}", {"bucket_cap": cap}),
        ):
            t0 = time.time()
            n_edges = lsh_candidate_pairs(sig, **kwargs).count()
            dt = time.time() - t0
            print(
                json.dumps(
                    {
                        "scale": scale,
                        "cluster_m": m,
                        "n_docs": m + n_bg,
                        "mode": mode,
                        "edges": n_edges,
                        "sec": round(dt, 2),
                    }
                )
            )
    spark.stop()


if __name__ == "__main__":
    main()

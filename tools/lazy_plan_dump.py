"""Dump the FULL LAZY plan of eagerly-materializing queries.

The iterative queries (g01-g04, closure families) truncate lineage with
(durable_/local)Checkpoint at construction, so their registered final
plan is a LocalTableScan/ExistingRDD — useless as plan-shape evidence.
This tool monkeypatches the lineage-truncation points to the identity,
so the query function returns its complete lazy DAG, and dumps
``.explain("formatted")`` of that. The patched run is NEVER used for
results — plan capture only.

Usage: python tools/lazy_plan_dump.py --tag before --out-dir plans/r12 \
           --only g01_pagerank,g02_connected_components
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.dataframe as _D  # noqa: E402

_D.DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore
_D.DataFrame.checkpoint = lambda self, eager=True: self  # type: ignore
try:  # Spark 4: the classic implementation OVERRIDES the base methods
    import pyspark.sql.classic.dataframe as _DC  # noqa: E402

    _DC.DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore
    _DC.DataFrame.checkpoint = lambda self, eager=True: self  # type: ignore
except ImportError:
    pass

from mxene_coin_cell_data_pipeline_spark import get_spark  # noqa: E402

try:  # r12+ trees route truncation through durable_checkpoint
    from mxene_coin_cell_data_pipeline_spark import checkpoint as _ck

    _ck.durable_checkpoint = lambda df, eager=True: df  # type: ignore
    for mod in list(sys.modules.values()):
        if getattr(mod, "durable_checkpoint", None) is not None:
            mod.durable_checkpoint = _ck.durable_checkpoint  # type: ignore
except ImportError:  # pre-r12 tree: DataFrame patches above cover it
    pass

from mxene_coin_cell_data_pipeline_spark.plans import QUERIES  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--only", required=True)
    ap.add_argument("--tag", default="lazy")
    ap.add_argument(
        "--out-dir",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r12",
        ),
    )
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_spark("lazy-plan-dump")
    for name in [n.strip() for n in args.only.split(",") if n.strip()]:
        df = QUERIES[name].spark(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = os.path.join(args.out_dir, f"{name}_{args.tag}.txt")
        with open(out, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {out} ({len(buf.getvalue())} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Dump .explain("formatted") for named queries to plans/r11/<name>_<tag>.txt.

Usage: python tools/explain_dump.py --tag before --only a,b,c [--sf DIR]

The optimization-round evidence trail (guide §1.1/§7.2): the judge
reads these committed files against the code's claims, so every plan
is captured from the same session configuration the bench uses.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mxene_coin_cell_data_pipeline_spark import get_spark  # noqa: E402
from mxene_coin_cell_data_pipeline_spark.plans import QUERIES  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--only", required=True)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"))
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_spark("explain-dump")
    names = [n.strip() for n in args.only.split(",") if n.strip()]
    for name in names:
        df = QUERIES[name].spark(spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

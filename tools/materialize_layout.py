"""Re-materialize the driver test tables through an ENGINE-OWNED layout.

The driver ships every table as a single-row-group, single-file snappy
parquet — a parquet file is splittable only at row-group boundaries, so
every scan of driver data runs as ONE task regardless of ``local[N]``
(SCALING.md "Driver data layout caps scan parallelism"). This tool
rewrites each table as multi-file parquet sized ~64k rows/file,
range-clustered on its natural key (time for the facts, join key for
orders/lineitem), timestamps normalized to plain LTZ micros by the
standard loader — i.e. the layout the engine's own writer
(sources/layout.py) would produce at scale.

Usage:
    python tools/materialize_layout.py [--sf /root/testdata/sf0.1]
        [--out /tmp/sf0.1_layout]

Then: SPARK_GRAFT_SF_DIR=/tmp/sf0.1_layout python bench.py
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mxene_coin_cell_data_pipeline_spark import get_spark  # noqa: E402
from mxene_coin_cell_data_pipeline_spark.sources.tables import (  # noqa: E402
    TABLE_NAMES,
    load_table,
)

ROWS_PER_FILE = 65536

#: natural clustering key per table (range-partitioned files → parquet
#: min/max stats enable file skipping on the common predicates)
CLUSTER_KEY = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "events": "ts",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf_layout")
    args = ap.parse_args()

    spark = get_spark("layout", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    # plain int64 micros on disk (not INT96) — splittable AND readable
    # by any engine (DuckDB included) without legacy-type handling
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    os.makedirs(args.out, exist_ok=True)
    for name in TABLE_NAMES:
        src = os.path.join(args.sf, f"{name}.parquet")
        if not os.path.exists(src):
            continue
        df = load_table(spark, args.sf, name)
        n_rows = df.count()
        n_files = max(1, math.ceil(n_rows / ROWS_PER_FILE))
        key = CLUSTER_KEY.get(name)
        out = os.path.join(args.out, f"{name}.parquet")
        if key is not None and n_files > 1:
            df = df.repartitionByRange(n_files, key)
        else:
            df = df.coalesce(n_files)
        df.write.mode("overwrite").parquet(out)
        print(f"{name}: {n_rows} rows -> {n_files} file(s)")
    spark.stop()


if __name__ == "__main__":
    main()

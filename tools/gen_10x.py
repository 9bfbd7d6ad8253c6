"""Generate the synthetic 10× scale-up dataset used by SCALING.md.

Perturbed replication of sf0.1 (default → /tmp/sf1x): every table is
replicated ``FACTOR`` times with keys offset per replica so join
cardinalities scale realistically (no accidental key collapse), and
document text gets a per-replica suffix so dedup finds 10× duplicate
clusters rather than 10× identical corpora. Dimension-like tables
(region, nation) are copied unchanged — at 100 TB the dims stay small;
that is the point of broadcasting them.

Usage: python tools/gen_10x.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from mxene_coin_cell_data_pipeline_spark import get_spark  # noqa: E402
from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table  # noqa: E402

# per-table key columns to offset per replica (column → per-replica stride)
OFFSETS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["emb_id"],
}
COPY_ONLY = ["region", "nation"]
STRIDE = 10_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("gen-10x")
    os.makedirs(out, exist_ok=True)
    for name in COPY_ONLY:
        load_table(spark, src, name).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"{name}: copied")
    for name, keys in OFFSETS.items():
        df = load_table(spark, src, name)
        if "emb_id" in keys and "emb_id" not in df.columns:
            keys = [df.columns[0]]
        rep = df.crossJoin(
            spark.range(factor).withColumnRenamed("id", "_replica")
        )
        for k in keys:
            rep = rep.withColumn(k, F.col(k) + F.col("_replica") * STRIDE)
        if name == "documents":
            rep = rep.withColumn(
                "text",
                F.when(
                    F.col("_replica") > 0,
                    F.concat(
                        F.col("text"),
                        F.lit(" replica "),
                        F.col("_replica").cast("string"),
                    ),
                ).otherwise(F.col("text")),
            )
            # keep the derived length column consistent with the
            # mutated text (replicas grew by the ' replica N' suffix)
            if "n_chars" in rep.columns:
                rep = rep.withColumn("n_chars", F.length("text"))
        rep.drop("_replica").write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"{name}: x{factor}")
    spark.stop()


if __name__ == "__main__":
    main()

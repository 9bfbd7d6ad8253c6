"""Physical layout tests: partition pruning actually happens, salted
aggregation is value-identical to the direct one."""

import pandas as pd
import numpy as np
import pytest
from pyspark.sql import functions as F

from mxene_coin_cell_data_pipeline_spark.sources.layout import (
    read_timeseries_partitioned,
    salted_two_phase,
    write_timeseries_partitioned,
)


@pytest.fixture(scope="module")
def ts(spark):
    rng = np.random.default_rng(3)
    n = 2000
    pdf = pd.DataFrame(
        {
            "cell_id": [f"CELL{i:02d}" for i in rng.integers(0, 20, n)],
            "timestamp": pd.to_datetime(rng.integers(0, 10**6, n), unit="s"),
            "cycle_index": rng.integers(1, 5, n),
            "discharge_ah": rng.uniform(0, 3, n),
            "voltage_v": rng.uniform(3.0, 4.2, n),
        }
    )
    return spark.createDataFrame(pdf)


def test_partitioned_roundtrip_and_pruning(spark, ts, tmp_path):
    path = str(tmp_path / "layer")
    write_timeseries_partitioned(ts, path, n_buckets=8)

    full = read_timeseries_partitioned(spark, path)
    assert full.count() == ts.count()

    cells = ["CELL03", "CELL07"]
    pruned = read_timeseries_partitioned(spark, path, cells=cells)
    expect = ts.filter(F.col("cell_id").isin(cells))
    assert pruned.count() == expect.count() > 0
    assert pruned.select("cell_id").distinct().count() == 2

    # the scan must prune partitions: the bucket predicate appears in
    # PartitionFilters, not as a post-scan filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cell_bucket" in plan.split("PartitionFilters:")[1].split("]")[0]


def test_salted_agg_matches_direct(spark, ts):
    keys = ["cell_id", "cycle_index"]
    aggs = {
        "Q_dis_Ah": F.max("discharge_ah"),
        "n_rows": F.count(F.lit(1)),
        "v_min": F.min("voltage_v"),
    }
    direct = (
        ts.groupBy(*keys)
        .agg(*[e.alias(n) for n, e in aggs.items()])
        .withColumn("n_rows", F.col("n_rows").cast("long"))
    )
    salted = salted_two_phase(ts, keys, aggs).withColumn(
        "n_rows", F.col("n_rows").cast("long")
    )
    assert salted.count() == direct.count()
    assert salted.exceptAll(direct).count() == 0
    assert direct.exceptAll(salted).count() == 0


def test_salted_rejects_non_algebraic(spark, ts):
    with pytest.raises(ValueError):
        salted_two_phase(ts, ["cell_id"], {"bad": F.avg("voltage_v")})

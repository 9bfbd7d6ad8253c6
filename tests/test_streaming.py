"""Streaming layer tests: every streaming operator is differential-
tested against its batch twin on the same rows (the lambda-architecture
invariant: stream state at end-of-feed == batch recompute)."""

import math
import os

import pytest

from fixtures import arbin_frame
from mxene_coin_cell_data_pipeline_spark.operators import normalize_cycler
from mxene_coin_cell_data_pipeline_spark.operators.capacity import (
    capacity_ce_per_cycle,
)
from mxene_coin_cell_data_pipeline_spark.operators.energy import energy_wh_per_cycle
from mxene_coin_cell_data_pipeline_spark.operators.normalize import (
    sign_flip_decisions,
)
from mxene_coin_cell_data_pipeline_spark.sources import read_cycler_csv
from mxene_coin_cell_data_pipeline_spark.streaming import (
    normalize_cycler_stream,
    read_cycler_stream,
    read_events_stream,
    run_stream_to_memory,
    stream_capacity_ce,
    stream_energy_trapezoid,
    windowed_event_rollup,
)


@pytest.fixture(scope="module")
def feed_dir(tmp_path_factory):
    """Cycler drop directory: the arbin fixture split into two export
    files (cycles 1-4 / 5-8) so availableNow+maxFilesPerTrigger=1
    exercises multi-micro-batch state."""
    d = tmp_path_factory.mktemp("feed")
    pdf = arbin_frame()
    cut = pdf["Cycle_Index"] <= 4
    pdf[cut].to_csv(os.path.join(d, "export_001.csv"), index=False)
    pdf[~cut].to_csv(os.path.join(d, "export_002.csv"), index=False)
    return str(d)


@pytest.fixture(scope="module")
def batch_ts(spark, feed_dir):
    return normalize_cycler(
        read_cycler_csv(spark, feed_dir + "/*.csv"), cell_id="CELL01"
    ).cache()


def _stream_ts(spark, feed_dir, flips):
    raw = read_cycler_stream(spark, feed_dir + "/*.csv", max_files_per_trigger=1)
    return normalize_cycler_stream(raw, cell_id="CELL01", sign_flip=flips)


def test_stream_normalize_matches_batch(spark, feed_dir, batch_ts):
    flips = sign_flip_decisions(batch_ts)
    out = run_stream_to_memory(_stream_ts(spark, feed_dir, flips), output_mode="append")
    assert out.count() == batch_ts.count()
    # exact row-set equality (order-free)
    assert out.exceptAll(batch_ts).count() == 0
    assert batch_ts.exceptAll(out).count() == 0


def test_stream_capacity_ce_matches_batch(spark, feed_dir, batch_ts):
    flips = sign_flip_decisions(batch_ts)
    updates = run_stream_to_memory(
        stream_capacity_ce(_stream_ts(spark, feed_dir, flips)), output_mode="update"
    ).toPandas()
    # last update per key is the final state
    final = (
        updates.groupby(["cell_id", "cycle_index"]).last().reset_index()
    )
    expect = (
        capacity_ce_per_cycle(batch_ts)
        .select("cell_id", "cycle_index", "Q_dis_Ah", "Q_chg_Ah", "CE")
        .toPandas()
        .sort_values("cycle_index")
        .reset_index(drop=True)
    )
    final = final.sort_values("cycle_index").reset_index(drop=True)
    assert len(final) == len(expect) == 8
    for col in ("Q_dis_Ah", "Q_chg_Ah", "CE"):
        assert final[col].tolist() == pytest.approx(expect[col].tolist(), abs=1e-12)


def test_stream_energy_stateful_matches_batch(spark, feed_dir, batch_ts):
    flips = sign_flip_decisions(batch_ts)
    updates = run_stream_to_memory(
        stream_energy_trapezoid(_stream_ts(spark, feed_dir, flips)),
        output_mode="update",
    ).toPandas()
    final = (
        updates.sort_values("n_points")
        .groupby(["cell_id", "cycle_index"])
        .last()
        .reset_index()
        .sort_values("cycle_index")
        .reset_index(drop=True)
    )
    expect = (
        energy_wh_per_cycle(batch_ts)
        .toPandas()
        .sort_values("cycle_index")
        .reset_index(drop=True)
    )
    assert len(final) == len(expect) == 8
    for got, want in zip(final["E_dis_Wh"], expect["E_dis_Wh"]):
        if want is None or (isinstance(want, float) and math.isnan(want)):
            assert got is None or math.isnan(got)
        else:
            # the stateful stream emits on a 1e-6 grid (cross-engine
            # stability rounding, streaming/features.py); the batch
            # trapezoid is unrounded — equal to within half a grid step
            assert got == pytest.approx(want, abs=5e-7)


def test_windowed_event_rollup_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from mxene_coin_cell_data_pipeline_spark.sources.tables import load_table

    stream = windowed_event_rollup(read_events_stream(spark, sf_dir))
    got = run_stream_to_memory(stream, output_mode="complete")

    ev = load_table(spark, sf_dir, "events")
    expect = (
        ev.groupBy(F.window("ts", "7 days").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # same exact-decimal accumulation as windowed_event_rollup —
            # associative, so stream (micro-batch merge order) == batch
            F.sum(F.round(F.col("value"), 6).cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )
    assert got.count() == expect.count() > 0
    assert got.exceptAll(expect).count() == 0


def test_stream_exact_dedup_matches_batch(spark, tmp_path):
    """Streaming dropDuplicates == batch exact dedup on a replayed
    corpus split across micro-batches (dup pairs straddle the split)."""
    import pandas as pd

    from mxene_coin_cell_data_pipeline_spark.streaming.features import (
        stream_exact_dedup,
    )

    d = tmp_path / "docs"
    d.mkdir()
    texts = ["alpha", "beta", "alpha", "gamma", "beta", "delta"]
    pd.DataFrame({"doc_id": [0, 1, 2], "text": texts[:3]}).to_parquet(d / "a.parquet")
    pd.DataFrame({"doc_id": [3, 4, 5], "text": texts[3:]}).to_parquet(d / "b.parquet")

    schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = run_stream_to_memory(stream_exact_dedup(stream), output_mode="append")
    kept = {r["text"] for r in out.collect()}
    assert kept == {"alpha", "beta", "gamma", "delta"}
    assert out.count() == 4  # one row per distinct content, even across batches

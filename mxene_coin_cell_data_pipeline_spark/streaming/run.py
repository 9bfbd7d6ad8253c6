"""Stream execution helpers.

``availableNow`` + memory sink turns any streaming plan into a
deterministic, fully-tested batch of micro-batches — the engine's
test/oracle harness path. Production sinks (kafka/parquet/console) use
the same plans with a different ``writeStream`` tail.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

_SEQ = itertools.count()


def run_stream_to_memory(
    df: DataFrame,
    output_mode: str = "complete",
    max_files_per_trigger: int | None = None,  # set on the reader, not here
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a
    memory sink; return the sink table as a batch DataFrame.

    ``complete`` mode re-emits full aggregation results (exact final
    answer — oracle-comparable); ``update`` mode leaves one row per
    state refresh in the sink (the *last* update per key is the final
    value — dedup driver-side if needed).
    """
    spark: SparkSession = df.sparkSession
    name = f"_stream_sink_{next(_SEQ)}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)

"""Feature assembly: the reference's join chain + end-to-end pipeline.

Reference (/root/reference/pipeline.py:294-296, step7/step10): features
= capacity ⟕ energy ⟕ IR ⟕ dQdV on cycle_index. All four inputs are
per-cycle tables (thousands of rows per cell), so every join is
broadcast-able; with AQE enabled Spark picks broadcast-hash joins
automatically, and we hint it explicitly for determinism at scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ._keys import cycle_keys
from .capacity import capacity_ce_per_cycle
from .dqdv import dqdv_peak_per_cycle
from .energy import energy_wh_per_cycle
from .ir import ir_c2_per_cycle


def combine_features(base: DataFrame, *others: DataFrame) -> DataFrame:
    """Left-join chain on the cycle keys (J1)."""
    keys = cycle_keys(base)
    return reduce(lambda acc, o: acc.join(F.broadcast(o), keys, "left"), others, base)


def full_feature_pipeline(
    ts: DataFrame, rated_ah: float = 3.0, dv: float = 0.05, cache: bool = True
) -> DataFrame:
    """Canonical timeseries → per-cycle feature table (pipeline.py:282-296).

    Four independent aggregations scan the timeseries; caching it (the
    equivalent of the reference's materialized normalize→parquet layer,
    pipeline.py:150) turns four source recomputes into one. Pass
    ``cache=False`` when ``ts`` is already a materialized parquet read.
    """
    if cache:
        ts = ts.persist()
    cap = capacity_ce_per_cycle(ts)
    ener = energy_wh_per_cycle(ts)
    ir = ir_c2_per_cycle(ts, rated_ah)
    dqdv = dqdv_peak_per_cycle(ts, dv)
    feat = combine_features(cap, ener, ir, dqdv)
    return feat.orderBy(*cycle_keys(ts))

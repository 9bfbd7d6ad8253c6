"""Per-cycle discharge energy via trapezoidal ∫V·I dt (SURVEY.md A5).

Reference semantics (/root/reference/pipeline.py:169-181):
``E_dis_Wh = |trapz(V·I, t)| / 3600`` over the cycle's DIS rows in
timestamp order; NULL when fewer than 2 DIS rows. ``np.trapz`` with any
NaN power/time yields NaN, so a null anywhere in V, I or t nulls the
cycle — reproduced with an explicit null-count guard (Spark ``sum``
would otherwise skip nulls).

The trapezoid is expressed with a lag window — algebraically identical
to np.trapz's pairwise form ``Σ 0.5·(p_i + p_{i-1})·(t_i − t_{i-1})`` —
then one hash aggregate. Cycles with no qualifying rows re-join via the
distinct-cycles frame so they still emit NULL (groupby-over-full-frame
behavior).

Scale: window + aggregate both shuffle on the same (cell, cycle) keys;
with AQE the exchange is reused, and per-cycle partitions are small and
uniform (cycles have bounded sample counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ._keys import cycle_keys, distinct_cycles, drop_null_cycles, is_dis


def energy_wh_per_cycle(df: DataFrame) -> DataFrame:
    keys = cycle_keys(df)
    dis = drop_null_cycles(df).filter(is_dis())
    t = F.col("timestamp").cast("double")  # fractional epoch seconds (C8)
    p = F.col("voltage_v") * F.col("current_a")
    w = Window.partitionBy(*keys).orderBy("timestamp")
    seg = 0.5 * (p + F.lag(p).over(w)) * (t - F.lag(t).over(w))
    # segments quantized to integer NANO watt-seconds with
    # floor(x*1e9+0.5): multiply/add/floor are IEEE-deterministic, the
    # int64 sum is exact and associative, so the per-cycle energy is
    # identical under any partition layout or engine (plain double sums
    # drift in the last ulp once cycles get large). Quantization error
    # ≤ 0.5e-9 per segment (~1e-11 Wh per cycle) — far inside the 1e-9
    # golden-test pins. Magnitude bound: |seg| ≤ p_max·dt_cycle ≈ 3e6
    # → 3e15 nano-units < 2^53, and cycle sums stay ≪ int64 range.
    # NaN power (a CSV literal 'NaN' survives lenient casts) must not
    # reach floor()::long — ANSI errors, non-ANSI silently yields 0.
    # Null it out; the _bad counter (which also counts NaN) then nulls
    # the whole cycle, the NULL-normalized equivalent of the
    # reference's NaN-propagating np.trapz.
    seg_safe = F.when(F.isnan(seg), F.lit(None)).otherwise(seg)
    seg_u = F.floor(seg_safe * F.lit(1e9) + F.lit(0.5)).cast("long")
    agg = (
        dis.withColumn("_seg_u", seg_u)
        .withColumn("_bad", p.isNull() | t.isNull() | F.isnan(p))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.when(F.col("_bad"), 1).otherwise(0)).alias("_nbad"),
            F.sum("_seg_u").alias("_e_ns"),
        )
        .select(
            *keys,
            F.when(
                (F.col("_n") >= 2) & (F.col("_nbad") == 0),
                F.abs(F.col("_e_ns").cast("double") / F.lit(1e9))
                / F.lit(3600.0),
            ).alias("E_dis_Wh"),
        )
    )
    return distinct_cycles(df).join(agg, keys, "left")

"""Event-stream operators: as-of join and sessionization.

Neither exists in the reference (its joins are per-cycle equi-joins,
SURVEY.md §2.5), but both are core timeseries alignment primitives for
cycler-lab data (align a slow temperature feed with fast cycler
samples) and for training-data event logs. Spark has no native ASOF
JOIN — the idiomatic distributed formulation is the union trick below,
ONE shuffle, no range-join explosion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
) -> DataFrame:
    """For each left row, the latest right row with ``right.on <=
    left.on`` within the same ``by`` group (backward as-of, ties
    included) — pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics.

    Union trick instead of a range join: tag the sides, sort each
    ``by`` group once by (time, side) with right-before-left on ties,
    and carry the right values forward with ``last_value ignorenulls``
    over an unbounded-preceding frame. One shuffle on ``by``; a naive
    range join is O(|L|·|R|) per group and needs a broadcast or
    cartesian — this is O((|L|+|R|) log) sort work, scale-safe.
    ``value_cols`` must not collide with left's columns.
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        *by, on, *value_cols
    ).withColumn("_side", F.lit(0))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side")


def range_join_count(
    probes: DataFrame,
    events: DataFrame,
    window_seconds: int,
    by: list[str],
    ts_col: str = "ts",
    probe_id_col: str = "event_id",
    count_col: str = "n_in_range",
) -> DataFrame:
    """Band (range) join rollup: for each probe row, how many event rows
    share its ``by`` keys and fall in ``[probe.ts - window, probe.ts)``.

    Spark has no native range join — a raw ``l.ts BETWEEN r.ts-w AND
    r.ts`` theta-join plans as BroadcastNestedLoop (O(|L|·|R|) per key
    group). The scale formulation is bucketed: quantize event times into
    ``window_seconds`` buckets (each event lands in exactly ONE bucket),
    explode each probe to its two candidate buckets (an interval of
    width w overlaps at most 2 such buckets), equi-join on
    (by…, bucket), then apply the exact band predicate. Work is
    O(|L|·2 + |R|) join rows instead of per-key cartesian, shuffles on
    (by…, bucket) — a uniformly-distributed key even when one ``by``
    key is hot. Probes with no in-range events keep count 0 (left
    join + count of matches).
    """
    w_us = F.lit(window_seconds * 1_000_000)
    p_us = F.unix_micros(F.col(ts_col))
    # bucket(p.ts - w) == bucket(p.ts) - 1 exactly (bucket width == w),
    # so the two candidates are always distinct — no dedup pass needed.
    p = probes.select(
        F.col(probe_id_col).alias("_pid"),
        *by,
        F.col(ts_col).alias("_pts"),
        F.explode(
            F.array(F.floor((p_us - w_us) / w_us), F.floor(p_us / w_us))
        ).alias("_bucket"),
    )
    e = events.select(
        *[F.col(c).alias(f"_e_{c}") for c in by],
        F.unix_micros(F.col(ts_col)).alias("_ets"),
        F.floor(F.unix_micros(F.col(ts_col)) / w_us).alias("_bucket"),
    )
    on = [p[c] == e[f"_e_{c}"] for c in by] + [p["_bucket"] == e["_bucket"]]
    in_band = (F.col("_ets") >= F.unix_micros(F.col("_pts")) - w_us) & (
        F.col("_ets") < F.unix_micros(F.col("_pts"))
    )
    joined = p.join(e, on, "left").select(
        "_pid", *by, "_pts", F.when(in_band, 1).otherwise(0).alias("_hit")
    )
    return (
        joined.groupBy("_pid", *by, "_pts")
        .agg(F.sum("_hit").alias(count_col))
        .select(
            F.col("_pid").alias(probe_id_col),
            *by,
            F.col("_pts").alias(ts_col),
            count_col,
        )
    )


def sessionize(
    ev: DataFrame,
    gap_seconds: int,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Gap-based session ids: a new session starts when the time since
    the previous event in the key group exceeds ``gap_seconds``.

    Two stacked windows over ONE partitioning (a single shuffle + sort,
    reused by both): lag to detect boundaries, running sum to number
    sessions. Session ids start at 1 and are dense per key.
    """
    keys = key_cols if key_cols is not None else ["user_id"]
    order = [F.col(ts_col).asc()] + (
        [F.col(order_tiebreak).asc()] if order_tiebreak else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    is_new = F.when(
        prev_us.isNull()
        | (F.unix_micros(F.col(ts_col)) - prev_us > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.withColumn("session_id", F.sum(is_new).over(run))


def resample_ffill(
    ev: DataFrame,
    every: str = "1 day",
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: list[str] | None = None,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Regular-grid resampling with forward fill: one row per key per
    grid step from the key's first to last observation, carrying the
    last observed value across empty steps — the gap-fill/alignment
    primitive behind every downsampled dashboard and feature table.

    Three stages, all built-ins: (1) per-key bounds → ``sequence()`` +
    explode generates each key's dense grid (rows ∝ output, never a
    cross join against a global calendar); (2) per-step last value via
    ``max_by`` over (ts, tiebreak) — order made explicit, no reliance
    on input order; (3) left join grid↔steps, then ``last ignorenulls``
    over the step order forward-fills gaps. Two shuffles total (the
    step agg and the join/window share the key partitioning).
    """
    keys = key_cols if key_cols is not None else ["user_id"]
    unit = every.split()[-1].rstrip("s")  # "1 day" → date_trunc unit
    step = F.expr(f"interval {every}")
    bucket = F.date_trunc(unit, F.col(ts_col))
    bounds = ev.groupBy(*keys).agg(
        F.min(bucket).alias("_d0"), F.max(bucket).alias("_d1")
    )
    grid = bounds.select(
        *keys, F.explode(F.sequence("_d0", "_d1", step)).alias("_step")
    )
    daily = ev.groupBy(*keys, bucket.alias("_step")).agg(
        F.max_by(
            F.col(value_col), F.struct(F.col(ts_col), F.col(order_tiebreak))
        ).alias("_step_value")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_step")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(daily, [*keys, "_step"], "left").select(
        *keys,
        F.col("_step").alias("step_start"),
        F.last("_step_value", ignorenulls=True).over(w).alias("value_ffill"),
    )


def session_stats(
    sessions: DataFrame,
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session rollup: event count + duration in microseconds."""
    keys = (key_cols if key_cols is not None else ["user_id"]) + ["session_id"]
    us = F.unix_micros(F.col(ts_col))
    return sessions.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )


def ewma(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    alpha: float = 0.2,
    tie_break: str = "event_id",
) -> DataFrame:
    """Exponentially weighted moving average per key in event-time
    order (pandas ``ewm(alpha, adjust=False)`` recurrence:
    ``y_0 = x_0; y_i = (1-a)*y_{i-1} + a*x_i``).

    The recurrence is sequential, but unrolls to the closed form
    ``y_i = r^i * (a * S_i + r * x_0)`` with ``r = 1-a`` and the prefix
    sum ``S_i = Σ_{j<=i} x_j * r^(-j)`` — one cumulative window per key,
    no Python, no iteration. CAVEAT (documented trade): ``r^(-j)``
    grows exponentially and the prefix sum accumulates in
    DECIMAL(38,12) (26 integer digits), so the closed form is exact
    only while ``|x| · r^(-(n-1)) < 1e26`` — n ≲ 246 at a=0.2 for
    unit-scale values. Keys past that bound get NULL ewma for EVERY
    row (a loud, whole-key signal — never silently dropped addends:
    in non-ANSI mode a per-row decimal overflow casts to NULL and the
    window sum would quietly skip it). For unbounded per-key history
    the scale path is a per-key sequential pass (``applyInPandas`` on
    the recurrence), which stays O(n) and exactly stable but leaves
    codegen. Both give the same math; this engine ships the window
    form as the default because event feeds are windowed/bounded per
    key in practice.
    """
    r = 1.0 - alpha
    w_ord = Window.partitionBy(key).orderBy(ts, tie_break)
    frame = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    i = (F.row_number().over(w_ord) - 1).cast("double")
    # the prefix sum accumulates in DECIMAL(38,12): the x_j * r^(-j)
    # doubles are identical on any engine, and the exact associative
    # decimal sum removes the accumulation-order sensitivity (cumulative
    # window sums associate differently across engines — segment tree vs
    # streaming).
    s = (
        F.sum((F.col(value) * F.pow(F.lit(r), -i)).cast("decimal(38,12)"))
        .over(frame)
        .cast("double")
    )
    x0 = F.first(value).over(frame)
    y = F.pow(F.lit(r), i) * (F.lit(alpha) * s + F.lit(r) * x0)
    # Whole-key overflow guard: the largest addend is max|x| · r^(-(n-1)).
    # Once it can exceed the decimal's 1e26 integer range, null the whole
    # key rather than let non-ANSI decimal casts null individual addends
    # (F.sum skips nulls → silently wrong values). Formulated as
    # pow(1/r, n-1) >= 1e26 / max|x| so an all-zero key (max|x|=0) never
    # trips it via 0·inf; identical double math on DuckDB for the oracle.
    w_key = Window.partitionBy(key)
    n_key = F.count(F.lit(1)).over(w_key)
    vmax = F.max(F.abs(F.col(value))).over(w_key)
    overflow = F.pow(F.lit(1.0 / r), (n_key - F.lit(1)).cast("double")) >= (
        F.lit(1e26) / F.greatest(vmax, F.lit(1e-300))
    )
    return events.select(
        key,
        tie_break,
        F.unix_micros(F.col(ts)).alias("ts_us"),
        F.col(value).alias(value),
        # round(,6): the decimal prefix-sum leaves ≤ ~1e-13 cross-engine
        # slack (large-magnitude addends cast at shortest-repr vs exact
        # expansion); value-scale outputs at a 1e-6 grid absorb it
        F.when(overflow, F.lit(None)).otherwise(F.round(y, 6)).alias("ewma"),
    )


def interval_coverage(
    events: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    duration_s: Column | None = None,
) -> DataFrame:
    """Sweep-line aggregation over half-open intervals ``[ts, ts+dur)``:
    per key, the maximum number of concurrently open intervals and the
    total covered (union) time — the overlap/occupancy primitive
    (concurrent sessions, instrument busy time, GPU occupancy).

    Classic sweep line, expressed relationally: explode each interval
    to a (+1 start, −1 end) boundary pair, one window per key ordered
    by (time, delta) — ends sort before starts at the same instant so
    touching intervals don't overlap — then the running sum IS the
    concurrency, and covered time is Σ gap-to-next-boundary where
    concurrency > 0. One shuffle on the key; never a self-join (the
    naive interval×interval overlap join is quadratic in the dense
    case, the sweep is O(n log n) sort work).
    """
    if duration_s is None:
        duration_s = 60 + (F.col("event_id") % 240)
    t0 = F.unix_micros(F.col(ts))
    t1 = t0 + duration_s.cast("bigint") * 1_000_000
    pts = events.select(
        key,
        F.explode(
            F.array(
                F.struct(t0.alias("t"), F.lit(1).alias("delta")),
                F.struct(t1.alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("p"),
    ).select(key, "p.t", "p.delta")
    w_ord = Window.partitionBy(key).orderBy("t", "delta")
    run = F.sum("delta").over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
    nxt = F.lead("t").over(w_ord)
    seg = pts.select(
        key,
        run.alias("conc"),
        F.when(F.col("delta") == 1, 1).otherwise(0).alias("is_start"),
        (nxt - F.col("t")).alias("gap"),
    )
    return seg.groupBy(key).agg(
        F.max("conc").alias("max_concurrency"),
        F.sum(F.when(F.col("conc") > 0, F.col("gap")).otherwise(F.lit(0))).alias(
            "covered_us"
        ),
        F.sum("is_start").alias("n_intervals"),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
) -> DataFrame:
    """For each left row, the EARLIEST right row with ``right.on >=
    left.on`` within the same ``by`` group (forward as-of, ties
    included) — the mirror of ``asof_join_backward``: same union trick,
    descending sort with right-before-left on ties, values carried
    backward with ``last_value ignorenulls``. One shuffle, no range
    join."""
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    l_tag = left.withColumn("_side", F.lit(1))
    # Carry ALL value columns as ONE struct through a single
    # last(ignorenulls): with per-column carries, tied right rows whose
    # NULLs fall in different value columns could assemble the output
    # row from different source rows. The struct guarantees every
    # carried column comes from the same winning right row. Left rows
    # get a NULL struct via allowMissingColumns, so ignorenulls skips
    # them (a struct built from NULL fields would NOT be null itself).
    r_tag = right.select(
        *by, on, F.struct(*value_cols).alias("_vals")
    ).withColumn("_side", F.lit(0))
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # tie-break on the carried struct so right-side rows sharing the
    # same `on` resolve identically across runs/partitionings (the bare
    # (on, _side) order is not total when right has duplicate
    # timestamps); struct comparison is lexicographic by field order on
    # both engines, and desc order means the LAST tied row in the frame
    # — the one last(ignorenulls) picks — is the field-wise minimum,
    # matching the oracle's min-value tie-break.
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col(on).desc(),
            F.col("_side").asc(),
            F.col("_vals").desc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_vals", F.last("_vals", ignorenulls=True).over(w))
    return (
        u.filter(F.col("_side") == 1)
        .select(
            *[c for c in u.columns if c not in ("_side", "_vals")],
            *[F.col(f"_vals.{c}").alias(c) for c in value_cols],
        )
    )

"""QC threshold checks over the features table (SURVEY.md §2.9 Q1-Q7).

Reference (/root/reference/step12_qc.py:21-73): seven aggregate checks,
warnings printed, process exits 1 when any check fires. All seven
collapse into ONE Spark aggregation producing a single scalar row; the
assertions run driver-side on that row, preserving the
exit-1-on-warning automation contract.

Medians are exact (``F.median``) to match pandas, per SURVEY.md §7's
watch list — not ``percentile_approx``.

SCALE BOUNDARY: this module targets the FEATURES layer — one row per
(cell, cycle), i.e. thousands of rows per cell, millions for a whole
fleet — never the raw sample-level timeseries. The exact ``F.median``
and ``countDistinct`` here are TypedImperativeAggregates whose final
merge buffers the column on a single node: perfectly fine at features
cardinality, not a 100 TB raw-data shape. For exact quantiles over
fact-scale data use the two-pass bucketed selection in
``functions.stats.exact_quantiles_2pass`` (query a17's plan — no
single-node buffer), or ``percentile_approx`` when a sketch bound is
acceptable (a25's plan). ``tests/test_qc.py::test_qc_targets_features_layer``
pins this contract.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Row, functions as F


@dataclass
class QCResult:
    passed: bool
    messages: list[str]
    stats: dict

    @property
    def exit_code(self) -> int:
        return 0 if self.passed else 1


def qc_aggregate(features: DataFrame) -> DataFrame:
    """The one-row aggregate feeding every check (single shuffle-free
    pass with map-side partial aggregation)."""
    ce = F.col("CE")
    q = F.col("Q_dis_Ah")
    ir = F.col("IR_C2_ohm")
    cols = set(features.columns)
    have = lambda c: c in cols  # noqa: E731
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("cycle_index").alias("n_cycles"),
        F.sum(F.when(F.col("cycle_index").isNull(), 1).otherwise(0)).alias("null_cycle"),
        F.sum(F.when(q.isNull(), 1).otherwise(0)).alias("null_qdis"),
        F.min(ce).alias("ce_min"),
        F.max(ce).alias("ce_max"),
        F.min_by(q, "cycle_index").alias("q_first"),
        F.max_by(q, "cycle_index").alias("q_last"),
    ]
    aggs.append(
        F.sum(F.when(F.col("E_dis_Wh") <= 0, 1).otherwise(0)).alias("n_epos_bad")
        if have("E_dis_Wh")
        else F.lit(None).cast("long").alias("n_epos_bad")
    )
    if have("IR_C2_ohm"):
        aggs += [
            F.sum(F.when(ir <= 0, 1).otherwise(0)).alias("n_ir_bad"),
            F.median(ir).alias("ir_median"),
        ]
    else:
        aggs += [
            F.lit(None).cast("long").alias("n_ir_bad"),
            F.lit(None).cast("double").alias("ir_median"),
        ]
    aggs.append(
        F.max(F.abs(F.col("dQdV_shift_mV"))).alias("shift_max_abs")
        if have("dQdV_shift_mV")
        else F.lit(None).cast("double").alias("shift_max_abs")
    )
    return features.agg(*aggs)


def qc_messages(s: Row) -> list[str]:
    """Threshold assertions on the aggregate row (step12_qc.py:21-57)."""
    msgs: list[str] = []
    if s["null_cycle"]:
        msgs.append("cycle_index has NULLs.")
    if s["null_qdis"]:
        msgs.append("Q_dis_Ah has NULLs (capacity missing).")
    if s["ce_min"] is not None and (s["ce_min"] < 0.95 or s["ce_max"] > 1.05):
        msgs.append(
            f"CE outside [0.95,1.05]: min={s['ce_min']:.3f}, max={s['ce_max']:.3f}"
        )
    if (
        s["n_rows"] >= 2
        and s["q_first"] is not None
        and s["q_last"] is not None
        and (s["q_last"] - s["q_first"]) > 0.02 * s["q_first"]
    ):
        msgs.append("Capacity increased >2% from first to last cycle (unexpected).")
    if s["n_epos_bad"]:
        msgs.append("Some discharge energies <= 0 Wh.")
    if s["n_ir_bad"]:
        msgs.append("IR_C2 has non-positive values.")
    if s["ir_median"] is not None and s["ir_median"] > 0.2:
        msgs.append(f"Median IR_C2 seems high: {s['ir_median']:.3f} Ω")
    if s["shift_max_abs"] is not None and s["shift_max_abs"] > 200:
        msgs.append(
            f"dQ/dV peak shift > 200 mV detected (max {s['shift_max_abs']:.1f} mV)"
        )
    return msgs


def qc_checks(features: DataFrame) -> QCResult:
    s = qc_aggregate(features).first()
    msgs = qc_messages(s)
    return QCResult(passed=not msgs, messages=msgs, stats=s.asDict())


def qc_report(features: DataFrame, cell: str = "") -> str:
    """Human-readable QC text mirroring step12_qc.py:60-73 output."""
    res = qc_checks(features)
    s = res.stats
    lines = [f"QC for {cell}", f"Rows: {s['n_rows']} | Cycles: {s['n_cycles']}"]
    if s["ce_min"] is not None:
        lines.append(f"CE range: {s['ce_min']:.3f} → {s['ce_max']:.3f}")
    if s["ir_median"] is not None:
        lines.append(f"IR_C2 median: {s['ir_median']:.4f} Ω")
    if res.messages:
        lines.append("WARNINGS:")
        lines += [f" - {m}" for m in res.messages]
    else:
        lines.append("QC PASS")
    return "\n".join(lines)

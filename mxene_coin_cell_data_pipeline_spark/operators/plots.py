"""Quick capacity/CE plots (SURVEY.md S8).

Reference (/root/reference/pipeline.py:245-257, step11_quick_plots.py).
The features table is tiny (one row per cycle), so plotting is a
driver-side ``toPandas`` + matplotlib. matplotlib is import-gated: the
engine works without it (plots simply unavailable).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame

try:  # pragma: no cover - environment dependent
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except Exception:  # pragma: no cover
    HAVE_MPL = False


def quick_plots(features: DataFrame, out_dir: str | Path) -> list[Path]:
    if not HAVE_MPL:
        raise NotImplementedError("matplotlib not available in this environment")
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    pdf = features.orderBy("cycle_index").toPandas()
    written = []
    for ycol, ylabel, title, fname in [
        ("Q_dis_Ah", "Discharge Capacity (Ah)", "Capacity vs Cycle", "plot_capacity.png"),
        ("CE", "Coulombic Efficiency", "CE vs Cycle", "plot_ce.png"),
    ]:
        plt.figure()
        plt.plot(pdf["cycle_index"], pdf[ycol], marker="o")
        plt.xlabel("Cycle")
        plt.ylabel(ylabel)
        plt.title(title)
        plt.grid(True)
        plt.tight_layout()
        path = out / fname
        plt.savefig(path)
        plt.close()
        written.append(path)
    return written

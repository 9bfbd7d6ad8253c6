"""Arrow-vectorized pandas UDF kernels (scalar + grouped-agg surfaces).

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf infers the UDF kind from *evaluated* type hints, and the
future import stringifies them (UNSUPPORTED_SIGNATURE).
"""

import sys

import pandas as pd

from pyspark.sql.functions import pandas_udf

from .._serde import register_self


@pandas_udf("double")
def sigmoid(z: pd.Series) -> pd.Series:
    """Vectorized logistic over an Arrow batch."""
    import numpy as np

    return pd.Series(1.0 / (1.0 + np.exp(-z.to_numpy())), index=z.index)


@pandas_udf("double")
def geo_mean(v: pd.Series) -> float:
    """Grouped-agg geometric mean: exp(mean(ln v)) — the whole group's
    values arrive as one Series. No partial aggregation exists for
    grouped-agg UDFs: every raw value shuffles to its reducer, so
    prefer built-in exp(avg(ln)) where expressible; this kernel is the
    custom-aggregate escape hatch.

    The log-domain mean quantizes each addend to int64 micro-units
    (the _fsum6 idiom from plans/_registry.py, applied in numpy): a
    raw float mean drifted on the 9th decimal at 100x (2M-value
    groups — numpy's pairwise sum vs the oracle's sequential avg),
    while the integer sum is exact and order-free. ln magnitudes are
    |ln v| < 50 for any double, so 2M-row groups stay ~5e13 micro —
    five orders under int64; per-row ln agreement across engines is
    the only residual (sub-ulp, measured stable)."""
    import numpy as np

    logs = np.log(v.to_numpy())
    micro = np.floor(logs * 1e6 + 0.5).astype(np.int64)
    return float(np.exp(micro.sum() / 1e6 / len(micro)))


register_self(sys.modules[__name__])

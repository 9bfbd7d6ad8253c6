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
    custom-aggregate escape hatch."""
    import numpy as np

    return float(np.exp(np.log(v.to_numpy()).mean()))


register_self(sys.modules[__name__])

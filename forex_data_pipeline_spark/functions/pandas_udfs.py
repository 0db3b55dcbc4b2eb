"""Arrow-vectorized UDF shapes that need REAL (non-string) type
annotations — pandas_udf infers SCALAR vs GROUPED_AGG from the
signature, so this module must NOT use `from __future__ import
annotations` (PEP 563 stringification breaks the inference).
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("bigint")
def to_cents(x: pd.Series) -> pd.Series:
    """SCALAR shape: vectorized exact cents cast (surface demo — the
    builtin round(x*100) is the production path). Half-AWAY rounding
    via sign·floor(|x·100|+0.5): pandas' .round() is half-EVEN and
    would diverge from Spark/DuckDB round() on exact .5 products."""
    import numpy as np

    scaled = x * 100
    return pd.Series(
        np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)
    ).astype("int64")


@pandas_udf("double")
def gini_from_cents(cents: pd.Series) -> float:
    """GROUPED_AGG shape: Gini coefficient over one group's integer
    cents. Python-int arithmetic throughout (arbitrary precision), one
    final float division — deterministic across engines."""
    xs = sorted(int(v) for v in cents)
    n = len(xs)
    total = sum(xs)
    if total == 0:  # all-zero group: Gini undefined, report 0
        return 0.0
    num = sum((2 * i - n - 1) * x for i, x in enumerate(xs, start=1))
    return float(num) / (n * total)


@pandas_udf("bigint")
def group_size(cents: pd.Series) -> int:
    """GROUPED_AGG shape: exact group row count (rides the same
    Arrow transfer as gini_from_cents)."""
    return len(cents)

"""Custom grouped-aggregate pandas UDAFs — SURVEY.md §2.11 UD3.

Robust reducers the built-in aggregate set lacks, as Arrow-batched
GROUPED_AGG pandas UDFs (one call per group per partition-chunk; Spark
handles the shuffle).  These are the UDAF surface demo for the engine;
per SURVEY.md §2 UD3 they are unit-tested, not oracle-declared (order
of float reduction inside a group is engine-defined).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def trimmed_mean_10(v: pd.Series) -> float:
    """10%-trimmed mean: drop the lowest/highest decile, mean the rest.
    The robust-mean reducer the reference's interactive workflows
    approximate by masking outlier points before fitting."""
    a = np.sort(v.dropna().to_numpy(dtype=np.float64))
    if a.size == 0:
        return float("nan")
    k = int(a.size * 0.1)
    core = a[k : a.size - k] if a.size - 2 * k > 0 else a
    return float(core.mean())


@pandas_udf("double")
def median_abs_deviation(v: pd.Series) -> float:
    """MAD: median(|x - median(x)|) — the robust spread estimate."""
    a = v.dropna().to_numpy(dtype=np.float64)
    if a.size == 0:
        return float("nan")
    med = float(np.median(a))
    return float(np.median(np.abs(a - med)))


@pandas_udf("double")
def weighted_mean_by_index(v: pd.Series) -> float:
    """Poisson-weighted mean: weights 1/max(x,1) (inverse-variance for
    counting statistics, the monitor-normalization idiom)."""
    a = v.dropna().to_numpy(dtype=np.float64)
    if a.size == 0:
        return float("nan")
    w = 1.0 / np.maximum(a, 1.0)
    return float((a * w).sum() / w.sum())


@pandas_udf("long")
def exact_micro_sum(v: pd.Series) -> int:
    """Order-independent EXACT reducer (r8): per-element HALF-AWAY
    micro-unit quantization (the engine's `_fixed6` rule, numpy form)
    then an int64 sum — the one UDAF shape that CAN be oracle-declared,
    because integer addition is associative/commutative while float
    reduction order inside a group is engine-defined.  Puts the
    GROUPED_AGG mechanism itself (Arrow group transport, null handling,
    long return path) under the driver's value-hash gate via
    q_udaf_micro_sum."""
    a = v.dropna().to_numpy(dtype=np.float64)
    if a.size == 0:
        return 0
    s = a * 1e6
    q = np.where(s >= 0, np.floor(s + 0.5), -np.floor(0.5 - s))
    return int(q.astype(np.int64).sum())

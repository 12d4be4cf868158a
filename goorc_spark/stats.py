"""Per-chunk column statistics, computed vectorized.

Plays two roles, mirroring the reference's ColumnStatistics (min/max/sum/
count, /root/reference/orc/column/int.go:75-82, string.go:69-90) plus the
extra signals the codec auto-selector needs (distinct ratio, run length,
monotonicity, bit-width spread) — signals the reference never computes
because its encoding choice is static per column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from goorc_spark.codecs.primitives import bits_required_fast

MAX_STAT_STR = 1024  # string min/max are truncated bounds past this length


def int_stats(v: np.ndarray) -> dict:
    """v: non-null int64 values."""
    if len(v) == 0:
        return {"count": 0}
    d = np.diff(v) if len(v) > 1 else np.array([], dtype=np.int64)
    runs = int((d != 0).sum()) + 1
    mono_up = bool((d >= 0).all()) if len(d) else True
    mono_dn = bool((d <= 0).all()) if len(d) else True
    u = v.astype(np.uint64) if v.min() >= 0 else None
    bits = bits_required_fast(np.abs(v).astype(np.uint64)) if u is None else bits_required_fast(u)
    return {
        "count": int(len(v)),
        "min": int(v.min()),
        "max": int(v.max()),
        "sum": int(v.sum(dtype=np.int64)),
        "avg_run": float(len(v) / runs),
        "monotone": bool(mono_up or mono_dn),
        "bits_p50": int(np.percentile(bits, 50)),
        "bits_p90": int(np.percentile(bits, 90)),
        "bits_max": int(bits.max()),
    }


def float_stats(v: np.ndarray) -> dict:
    if len(v) == 0:
        return {"count": 0}
    return {
        "count": int(len(v)),
        "min": float(np.nanmin(v)),
        "max": float(np.nanmax(v)),
        "sum": float(np.nansum(v)),
    }


def string_stats(values: pd.Series) -> dict:
    """values: non-null str Series."""
    n = len(values)
    if n == 0:
        return {"count": 0, "distinct": 0, "distinct_ratio": 0.0, "avg_len": 0.0}
    lens = values.str.len().to_numpy()
    distinct = int(values.nunique())
    mn, mx = values.min(), values.max()
    return {
        "count": int(n),
        "distinct": distinct,
        "distinct_ratio": distinct / n,
        "avg_len": float(lens.mean()),
        "max_len": int(lens.max()),
        "total_len": int(lens.sum()),
        "min": str(mn)[:MAX_STAT_STR],
        "max": str(mx)[:MAX_STAT_STR],
        "lower_bound_truncated": len(str(mn)) > MAX_STAT_STR,
        "upper_bound_truncated": len(str(mx)) > MAX_STAT_STR,
    }


def bool_stats(v: np.ndarray) -> dict:
    return {
        "count": int(len(v)),
        "true_count": int(v.sum()),
        "false_count": int(len(v) - v.sum()),
    }

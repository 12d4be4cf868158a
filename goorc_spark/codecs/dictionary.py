"""Dictionary encoding for string columns (DICTIONARY_V2 semantics).

The dictionary is sorted lexicographically and row values are rewritten to
sorted-dict indexes — the same observable semantics as the reference's
dictionary writer (/root/reference/orc/column/string.go:543-759), but built
vectorized with pandas.factorize + argsort instead of a per-row map (the
reference's per-row map + 1-based-position quirk is exactly what we avoid;
correctness is established by round-trip tests, not by copying).

Streams produced: DATA = unsigned RLEv2 indexes, DICT_LENGTH = unsigned
RLEv2 entry lengths, DICT_DATA = concatenated entry bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def build(values) -> tuple[np.ndarray, list]:
    """values: sequence of str/bytes (no nulls).

    Returns (indexes: uint64 array, sorted dictionary entries list).
    """
    codes, uniques = pd.factorize(pd.Series(values, dtype=object), sort=True)
    if (codes < 0).any():
        raise ValueError("nulls must be stripped before dictionary build")
    return codes.astype(np.uint64), list(uniques)


def apply(indexes: np.ndarray, entries: list) -> list:
    arr = np.asarray(entries, dtype=object)
    return list(arr[np.asarray(indexes, dtype=np.int64)])

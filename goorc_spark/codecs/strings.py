"""String/binary contents stream: concatenated bytes + a LENGTH stream.

Matches the reference's DIRECT_V2 string layout (contents pass-through +
unsigned RLEv2 lengths; /root/reference/orc/encoding/string.go:18-43,
/root/reference/orc/column/string.go:18-203) — which is also exactly
Arrow's variable-width binary layout, so the numpy side is zero-copy-ish.
"""

from __future__ import annotations

import numpy as np


def concat_utf8(values) -> tuple[bytes, np.ndarray]:
    """values: sequence of bytes/str (no nulls). Returns (contents, lengths)."""
    bs = [v.encode("utf-8") if isinstance(v, str) else bytes(v) for v in values]
    lengths = np.fromiter((len(x) for x in bs), dtype=np.uint64, count=len(bs))
    return b"".join(bs), lengths


def split_utf8(contents: bytes, lengths: np.ndarray, as_str: bool = True) -> list:
    offs = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(np.asarray(lengths, dtype=np.int64), out=offs[1:])
    mv = memoryview(contents)
    if as_str:
        return [str(mv[offs[i] : offs[i + 1]], "utf-8") for i in range(len(lengths))]
    return [bytes(mv[offs[i] : offs[i + 1]]) for i in range(len(lengths))]

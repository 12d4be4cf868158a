"""ORC boolean RLE: 8 bools packed MSB-first per byte, then byte-RLE.

Used for PRESENT (validity) bitmaps and boolean DATA streams. Pinned by the
reference vector [T,F,F,F,F,F,F,F] <-> ff 80
(/root/reference/orc/encoding/encoding_test.go:586-607).
"""

from __future__ import annotations

import numpy as np

from goorc_spark.codecs import byterle


def encode(bits: np.ndarray) -> bytes:
    b = np.asarray(bits).astype(bool)
    packed = np.packbits(b, bitorder="big")  # pads the tail with 0 bits
    return byterle.encode(packed)


def decode(data, count: int) -> np.ndarray:
    nbytes = (count + 7) // 8
    packed = byterle.decode(data, nbytes)
    return np.unpackbits(packed, bitorder="big")[:count].astype(bool)


def decode_prefix(data, count: int) -> np.ndarray:
    """decode() over a stream window that may hold more runs than needed
    (row-index seek); byte-RLE may overshoot the final run."""
    nbytes = (count + 7) // 8
    packed = byterle.decode_prefix(data, nbytes)
    return np.unpackbits(packed, bitorder="big")[:count].astype(bool)

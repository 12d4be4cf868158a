"""Big-endian bit packing at arbitrary widths (1..64), vectorized.

This is the physical layout under RLEv2 DIRECT / PATCHED_BASE / DELTA
literals (public ORC v1 spec; behavior pinned by the reference's DIRECT
vector [23713,57005,43806,48879] <-> 5e 03 5c a1 de ad ab 1e be ef,
/root/reference/orc/encoding/encoding_test.go:365-375).
"""

from __future__ import annotations

import numpy as np


def pack(values: np.ndarray, width: int) -> bytes:
    """Bit-pack uint64 values MSB-first at `width` bits each."""
    width = int(width)
    if width <= 0 or len(values) == 0:
        return b""
    u = np.ascontiguousarray(np.asarray(values, dtype=np.uint64))
    if width == 64:
        return u.astype(">u8").tobytes()
    if width == 8:
        return u.astype(np.uint8).tobytes()
    be = u.astype(">u8").view(np.uint8).reshape(-1, 8)
    bits = np.unpackbits(be, axis=1)[:, 64 - width :]
    return np.packbits(bits.ravel()).tobytes()


def unpack(data, width: int, count: int, bit_offset: int = 0) -> np.ndarray:
    """Unpack `count` uint64 values of `width` bits starting at `bit_offset`
    bits into `data`."""
    width = int(width)
    if width == 0:
        return np.zeros(count, dtype=np.uint64)
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(data, dtype=np.uint8)
    if width == 8 and bit_offset % 8 == 0:
        s = bit_offset // 8
        return b[s : s + count].astype(np.uint64)
    if width == 64 and bit_offset % 8 == 0:
        s = bit_offset // 8
        return (
            b[s : s + count * 8].view(">u8").astype(np.uint64)
            if b[s : s + count * 8].flags.c_contiguous
            else np.ascontiguousarray(b[s : s + count * 8]).view(">u8").astype(np.uint64)
        )
    need_bits = bit_offset + count * width
    need_bytes = (need_bits + 7) // 8
    bits = np.unpackbits(b[:need_bytes])[bit_offset : bit_offset + count * width]
    bits = bits.reshape(count, width)
    full = np.zeros((count, 64), dtype=np.uint8)
    full[:, 64 - width :] = bits
    return np.ascontiguousarray(np.packbits(full, axis=1)).view(">u8").ravel().astype(np.uint64)


def packed_size(count: int, width: int) -> int:
    return (count * width + 7) // 8

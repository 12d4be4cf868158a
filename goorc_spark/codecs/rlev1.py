"""ORC integer run-length encoding VERSION 1 (decode only) — the
Hive-era format that pre-0.12 writers emit (`orc.write.format=0.11`);
modern writers emit RLEv2, so the write side is deliberately absent.

Wire format (public ORC v1 spec "Run Length Encoding version 1"; the
reference handles both generations via its column factory,
/root/reference/orc/column/package.go:69-199):
- control byte 0..127   => run of (control + 3) values: one SIGNED delta
                           byte follows, then the base value varint;
                           values are base, base+delta, base+2*delta, ...
- control byte 128..255 => (256 - control) literal varints follow.
Signed streams zigzag their varints exactly like RLEv2.

Pinned by the spec's own examples (100 x 7 => "61 00 07",
literals [2,3,6,7,11] => "fb 02 03 06 07 0b") and by Spark-written
0.11-format golden files in tests/test_orc_native.py.
"""

from __future__ import annotations

import numpy as np

from goorc_spark.codecs.primitives import decode_svarints, decode_uvarints

MIN_REPEAT = 3
_MAX_RUN = 130  # 127 + MIN_REPEAT: largest single run either form emits


def decode(data, count: int, signed: bool = True) -> np.ndarray:
    """Decode `count` values from an exact RLEv1 stream."""
    out, got = _decode_runs(data, count, signed, slack=0)
    if got != count:
        raise ValueError(f"rlev1 decoded {got} values, expected {count}")
    return out


def decode_prefix(data, count: int, signed: bool = True) -> np.ndarray:
    """decode() over a stream window that may hold more runs than needed
    (row-index seek); the final run may overshoot `count`."""
    out, got = _decode_runs(data, count, signed, slack=_MAX_RUN + 2)
    if got < count:
        raise ValueError(f"rlev1 decoded {got} values, expected >= {count}")
    return out[:count]


def _decode_runs(data, count: int, signed: bool, slack: int):
    buf = memoryview(data)
    out = np.empty(count + slack, dtype=np.int64 if signed else np.uint64)
    got = 0
    off = 0
    end = len(buf)
    while got < count and off < end:
        c = buf[off]
        off += 1
        if c < 128:
            rep = c + MIN_REPEAT
            # sign-extend the delta byte without np.int8 (out-of-bound
            # conversion raises OverflowError on NumPy >= 2.0)
            delta = buf[off] - 256 if buf[off] >= 128 else buf[off]
            off += 1
            if signed:
                vals, off = decode_svarints(buf, 1, off)
                base = int(vals[0])
                out[got:got + rep] = base + delta * np.arange(rep,
                                                              dtype=np.int64)
            else:
                vals, off = decode_uvarints(buf, 1, off)
                base = int(vals[0])
                seq = base + delta * np.arange(rep, dtype=np.int64)
                out[got:got + rep] = seq.astype(np.uint64)
            got += rep
        else:
            lit = 256 - c
            if signed:
                vals, off = decode_svarints(buf, lit, off)
            else:
                vals, off = decode_uvarints(buf, lit, off)
            out[got:got + lit] = vals
            got += lit
    return out, got

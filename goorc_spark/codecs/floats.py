"""Raw IEEE float streams.

float32: big-endian 4 bytes; float64: little-endian 8 bytes (the Java-writer
byte order the reference matches; see /root/reference/orc/encoding/float.go:
25-78 and the double round-trip vector at encoding_test.go:196-216).
"""

from __future__ import annotations

import numpy as np


def encode_f32(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(np.asarray(values, dtype=np.float32)).astype(">f4").tobytes()


def decode_f32(data, count: int) -> np.ndarray:
    return np.frombuffer(data, dtype=">f4", count=count).astype(np.float32)


def encode_f64(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(np.asarray(values, dtype=np.float64)).astype("<f8").tobytes()


def decode_f64(data, count: int) -> np.ndarray:
    return np.frombuffer(data, dtype="<f8", count=count).astype(np.float64)

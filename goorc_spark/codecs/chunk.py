"""General-purpose compression container: fixed-size chunks, each either
zlib(deflate)-compressed or stored-original when compression would expand.

Chunk header: 3 bytes little-endian = (chunk_length << 1) | is_original
(public ORC spec; reference behavior at /root/reference/orc/common/misc.go:
72-141, 212-290). Default chunk size 256 KB like the reference writer
(/root/reference/orc/config/opts.go:17).
"""

from __future__ import annotations

import zlib

DEFAULT_CHUNK_SIZE = 256 * 1024
NONE = "none"
ZLIB = "zlib"


def compress(data: bytes, kind: str = ZLIB, chunk_size: int = DEFAULT_CHUNK_SIZE, level: int = 6) -> bytes:
    if kind == NONE:
        return data
    out = bytearray()
    for pos in range(0, len(data), chunk_size):
        raw = data[pos : pos + chunk_size]
        comp = zlib.compress(raw, level)[2:-4]  # raw deflate: strip zlib wrapper
        if len(comp) < len(raw):
            out += ((len(comp) << 1) | 0).to_bytes(3, "little")
            out += comp
        else:
            out += ((len(raw) << 1) | 1).to_bytes(3, "little")
            out += raw
    return bytes(out)


def decompress(data: bytes, kind: str = ZLIB) -> bytes:
    if kind == NONE:
        return data
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        h = int.from_bytes(data[pos : pos + 3], "little")
        length = h >> 1
        original = h & 1
        pos += 3
        raw = data[pos : pos + length]
        pos += length
        out += raw if original else zlib.decompress(raw, wbits=-15)
    return bytes(out)

"""Arrow-native stripe assembly: pyarrow RecordBatch/Table <-> stripe blob.

Same wire format and metadata as stripe.py (the pandas path) — the two
interoperate — but extraction is zero-copy from Arrow buffers:

- string contents/lengths come straight from the Arrow utf8 layout (the
  reference's DIRECT_V2 layout IS Arrow's: contents + lengths,
  /root/reference/orc/encoding/string.go:18-43);
- dictionary encoding uses pyarrow.compute.dictionary_encode (C++ hash) +
  sort_indices, then a vectorized index remap — same sorted-dict semantics
  as the reference writer (/root/reference/orc/column/string.go:661-689)
  without its per-row map;
- ints/timestamps/floats view the validity-compacted values as numpy.

No per-row Python anywhere on the hot path (BASELINE.json input_hint);
decimal is the one object-typed fallback.
"""

from __future__ import annotations

import decimal as _decimal
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from goorc_spark import selector, stats as stx
from goorc_spark.codecs import (
    boolrle,
    byterle,
    chunk,
    dictionary,
    floats,
    fsst,
    rlev2,
    strings,
    timestamps,
)
from goorc_spark.codecs.primitives import decode_svarints, encode_svarints

FORMAT_VERSION = 1

_PA_BY_KIND = {
    "byte": pa.int8(), "short": pa.int16(), "int": pa.int32(),
    "long": pa.int64(), "bool": pa.bool_(), "float": pa.float32(),
    "double": pa.float64(), "string": pa.large_string(),
    "binary": pa.large_binary(), "date": pa.date32(),
}

INT_CAST = {"short", "int", "long", "date"}


def spec_arrow_type(col: dict, tz: str | None = None):
    """Arrow type a DECLARED spec column must decode to (None for nested
    kinds — those keep their decoded layout). Used by engine.decode_df to
    coerce stripes whose embedded meta was written under a different source
    type (schema drift) to the spec the mapInArrow schema promises Spark."""
    kind = col["kind"]
    if kind == "timestamp":
        return pa.timestamp("us", tz=tz)
    if kind == "timestamp_ntz":
        return pa.timestamp("us")
    if kind == "decimal":
        return pa.decimal128(int(col.get("precision", 18)),
                             int(col.get("scale", 0)))
    return _PA_BY_KIND.get(kind)

# kinds whose per-row-group [min, max] is recorded for predicate seek
_RANGE_KINDS = {"byte", "short", "int", "long", "float", "double", "date",
                "timestamp", "timestamp_ntz", "string"}

_STAT_STR_MAX = 64


def _bound_str(s: str, is_max: bool) -> str:
    """Truncate a string statistic the ORC way: the stored bound must stay
    a valid bound, so a min truncates to its prefix (prefix <= original)
    and a max bumps the last kept char (greater than every string sharing
    the prefix). Falls back to the full string at the codepoint ceiling."""
    if len(s) <= _STAT_STR_MAX:
        return s
    t = s[:_STAT_STR_MAX]
    if not is_max:
        return t
    for i in range(len(t) - 1, -1, -1):
        c = ord(t[i])
        if c < 0x10FFFF:
            nc = c + 1
            if 0xD800 <= nc <= 0xDFFF:  # skip the surrogate gap
                nc = 0xE000
            return t[:i] + chr(nc)
    return s


def _as_array(x) -> pa.Array:
    return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x


def _valid_mask(arr: pa.Array) -> np.ndarray | None:
    if arr.null_count == 0:
        return None
    return np.asarray(pc.is_valid(arr))


def _list_parts(vals: pa.Array) -> tuple[np.ndarray, list[pa.Array]]:
    """(lengths, [child arrays]) for a no-null ListArray/MapArray. Offsets
    are logical (windowed) while .values/.keys/.items are physical, so the
    children are gathered when the offsets aren't already dense."""
    is_map = pa.types.is_map(vals.type)
    if len(vals) == 0:
        empty_children = ([vals.type.key_type, vals.type.item_type]
                          if is_map else [vals.type.value_type])
        return (np.empty(0, np.uint64),
                [pa.array([], t) for t in empty_children])
    off = np.asarray(vals.offsets).astype(np.int64)
    lengths = np.diff(off)
    physical = [vals.keys, vals.items] if is_map else [vals.values]
    dense = off[0] == 0 and off[-1] == len(physical[0])
    if not dense:
        total = int(lengths.sum())
        starts = off[:-1]
        ends_excl = np.cumsum(lengths)
        intra = np.arange(total, dtype=np.int64) \
            - np.repeat(ends_excl - lengths, lengths)
        child_idx = pa.array(np.repeat(starts, lengths) + intra)
        physical = [p.take(child_idx) for p in physical]
    return lengths.astype(np.uint64), physical


def _varwidth_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(contents uint8, lengths) from a string/binary array (either offset
    width) with no nulls — zero-copy from the Arrow buffers."""
    if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        odt, osz = np.int32, 4
    else:
        odt, osz = np.int64, 8
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=odt,
                            count=len(arr) + 1, offset=osz * arr.offset)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.empty(0, np.uint8)
    lengths = np.diff(offsets.astype(np.int64))
    return data[offsets[0]:offsets[-1]], lengths.astype(np.uint64)


# ----------------------------------------------------------------- encode --


def _rg_bloom_entry(arr, fpp: float) -> dict:
    """Per-row-group bloom over the group's DISTINCT key values, sized to
    the distinct count (a conv-clustered 10k-row group holds ~1k convs ->
    ~1.2 KB at 1% fpp). Canonical hash bytes: raw UTF-8/bytes for
    string/binary keys (vectorized off the Arrow buffers),
    primitives.canonical_key_bytes for anything else (equal-comparing
    values hash identically — Decimal('1.50')==Decimal('1.5'), tz-aware
    instants, 1.0==1; ADVICE r4) — select_row_groups probes with the same
    form."""
    import base64

    from goorc_spark.codecs import murmur3
    from goorc_spark.codecs.primitives import canonical_key_bytes

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    dist = pc.unique(arr).drop_null()
    t = dist.type
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        hashes = murmur3.hash64_arrow(dist)
    else:
        hashes = murmur3.hash64_many(
            [canonical_key_bytes(v) for v in dist.to_pylist()])
    m, k = murmur3.bloom_params(max(len(dist), 1), fpp)
    words = murmur3.build_bloom(hashes, k, m)
    return {"k": k, "b64": base64.b64encode(words.tobytes()).decode()}


def _rg_bloom_key_hash(key_value) -> int:
    """Writer-domain 64-bit hash of one probe key
    (primitives.canonical_key_bytes — mirrors _rg_bloom_entry)."""
    from goorc_spark.codecs import murmur3
    from goorc_spark.codecs.primitives import canonical_key_bytes

    return murmur3.hash64(canonical_key_bytes(key_value))


def _rg_bloom_words(entry: dict) -> np.ndarray:
    import base64

    return np.frombuffer(base64.b64decode(entry["b64"]), dtype="<u8")


def rg_bloom_probe(entry: dict, key_value) -> bool:
    """Membership test against a _rg_bloom_entry (False = provably absent)."""
    from goorc_spark.codecs import murmur3

    return murmur3.might_contain(_rg_bloom_words(entry), entry["k"],
                                 _rg_bloom_key_hash(key_value))


def encode_stripe_table(
    table: pa.Table,
    spec: list[dict],
    compression: str = chunk.DEFAULT,
    chunk_size: int = chunk.DEFAULT_CHUNK_SIZE,
    policy: str = "balanced",
    cache: dict | None = None,
    rg_rows: int | None = None,
    key_col: str | None = None,
    ord_col: str | None = None,
    rg_bloom: float | None = None,
) -> tuple[bytes, dict]:
    """`cache` (optional, per-task) reuses codec decisions and trained FSST
    symbol tables across consecutive stripes of one partition — the data is
    a uniform hash-sample of the same keys, so the table stays good, and
    the stored-original fallback bounds any drift.

    `rg_rows` splits the stripe into row groups of that many rows, each
    independently decodable (its own stream segments in the shared blob) and
    carrying key/order min-max — the analog of the reference's row-index
    stride + positions (/root/reference/orc/stream/writer.go:29-41,
    pb/orc_proto.proto RowIndexEntry). Design difference, deliberate: the
    reference records (chunk offset, decompressed offset, run offset)
    triples into continuous streams; we restart codecs at group boundaries
    so one offset suffices — a small compression cost (measured in
    BASELINE.md) for a far simpler seek path. Codec choices + FSST tables
    are shared across groups via `cache`, so the selector runs once."""
    n = table.num_rows
    if not rg_rows or n <= rg_rows:
        blob = bytearray()
        cols_meta = [
            _write_column(_as_array(table.column(col["name"])), col, blob,
                          compression, chunk_size, policy, cache)
            for col in spec
        ]
        meta = {
            "version": FORMAT_VERSION,
            "n_rows": n,
            "compression": compression,
            "chunk_size": chunk_size,
            "columns": cols_meta,
            "col_stats": stripe_col_stats(table, spec),
            "crc32": zlib.crc32(bytes(blob)),
        }
        return bytes(blob), meta
    cache = {} if cache is None else cache  # force sharing across groups
    blob = bytearray()
    groups = []
    for start in range(0, n, rg_rows):
        sub = table.slice(start, min(rg_rows, n - start))
        start_off = len(blob)
        cols_meta = [
            _write_column(_as_array(sub.column(col["name"])), col, blob,
                          compression, chunk_size, policy, cache)
            for col in spec
        ]
        if start > 0:
            # diagnostics (stats, sub-encoding histograms) live in group 0
            # only — decode never reads them and N groups x M columns of
            # repeated stats would dominate the stripe meta JSON
            _strip_diagnostics(cols_meta)
        g: dict = {"n_rows": sub.num_rows, "offset": start_off,
                   "length": len(blob) - start_off, "columns": cols_meta}
        for label, cname in (("key", key_col), ("ord", ord_col)):
            if cname is not None and cname in sub.schema.names:
                mm = pc.min_max(sub.column(cname))
                g[f"{label}_min"] = mm["min"].as_py()
                g[f"{label}_max"] = mm["max"].as_py()
        if rg_bloom and key_col is not None \
                and key_col in sub.schema.names:
            # under hash placement every group's [key_min, key_max] spans
            # the key space and range pruning is useless — the per-group
            # bloom is what skips groups (the stripe-level analog is
            # engine._build_bloom; ORC-side: BLOOM_FILTER_UTF8 streams)
            g["key_bloom"] = _rg_bloom_entry(sub.column(key_col), rg_bloom)
        # per-group value ranges for every orderable scalar column — the
        # reference's RowIndexEntry statistics (pb/orc_proto.proto:92-99):
        # generic predicate seek (read_where) prunes groups on ANY column,
        # not just the clustering key. String bounds are truncated the ORC
        # way (prefix for min; prefix with last char bumped for max) so a
        # long text column costs <=130 chars of meta per group.
        rng = {}
        for col in spec:
            if col["kind"] in _RANGE_KINDS and col["name"] not in (key_col,
                                                                   ord_col):
                carr = sub.column(col["name"])
                if col["kind"] == "string":
                    # stats only for SHORT string columns (roles, tags,
                    # ids): range predicates don't target free text, and
                    # min_max over a long text column costs ~15% of the
                    # whole stripe encode (measured) for stats nobody probes
                    nbytes = sum(c.get_total_buffer_size()
                                 for c in (carr.chunks
                                           if hasattr(carr, "chunks")
                                           else [carr]))
                    if nbytes > 32 * max(len(carr), 1):
                        continue
                mm = pc.min_max(carr)
                lo = mm["min"].as_py()
                if lo is not None:
                    hi = mm["max"].as_py()
                    if col["kind"] == "string":
                        lo = _bound_str(lo, is_max=False)
                        hi = _bound_str(hi, is_max=True)
                    rng[col["name"]] = [lo, hi]
        if rng:
            g["ranges"] = rng
        groups.append(g)
    meta = {
        "version": FORMAT_VERSION,
        "n_rows": n,
        "compression": compression,
        "chunk_size": chunk_size,
        "row_groups": groups,
        "col_stats": stripe_col_stats(table, spec),
        "crc32": zlib.crc32(bytes(blob)),
    }
    return bytes(blob), meta


_INT_STAT_KINDS = {"byte", "short", "int", "long"}
_I64_MIN, _I64_MAX = -(1 << 63), (1 << 63) - 1


def _exact_int_sum(arr, mn: int, mx: int) -> int | None:
    """Exact integer column sum with overflow detection: pc.sum and np.sum
    both wrap silently in int64, so a hot column near the bound would
    report a WRONG sum_long; the reference's footer statistics omit the
    sum on overflow instead (ADVICE r3) — mirrored here as an explicit
    None marker (distinct from 'kind has no sum') so the run_stats rollup
    can drop the whole-run sum when any stripe overflowed. Cheap proof
    first: when n·max|bound| provably fits, the plain int64 sum is exact;
    only a stripe that MIGHT overflow pays the 32-bit-limb pass."""
    n = len(arr) - arr.null_count
    if n == 0:
        return 0
    if n * max(abs(mn), abs(mx)) <= _I64_MAX:  # Python ints: proof can't wrap
        return int(pc.sum(arr).as_py())
    a = np.asarray(arr.drop_null().cast(pa.int64()).combine_chunks()
                   if isinstance(arr, pa.ChunkedArray)
                   else arr.drop_null().cast(pa.int64()))
    # limb sum: v = (v >> 32)·2^32 + (v & 0xffffffff); each limb's sum is
    # provably exact for any realistic stripe row count (< 2^31 rows)
    lo = int((a & 0xFFFFFFFF).astype(np.uint64).sum())
    hi = int((a >> 32).sum())
    total = hi * (1 << 32) + lo
    return total if _I64_MIN <= total <= _I64_MAX else None


def stripe_col_stats(table: pa.Table, spec: list[dict]) -> dict:
    """Whole-stripe per-column statistics — the engine's analog of the
    reference's file-footer ColumnStatistics rollup
    (/root/reference/orc/writer.go:140-177): n/nulls always; typed min/max
    for orderable scalars (timestamps as epoch-micros, dates as days,
    decimals as strings); sum for integer kinds (bool: true-count); byte
    totals for string/binary. String min/max is recorded only when the
    column's stripe bytes stay under 32 B/value (ids, roles, tags) — a
    whole-stripe min_max over free text buys stats nobody probes at real
    encode cost (the same measured trade as the row-group ranges), so
    `engine.run_stats` surfaces a string bound only when EVERY stripe
    recorded one. Nested kinds carry n/nulls only."""
    out: dict = {}
    for col in spec:
        arr = table.column(col["name"])
        kind = col["kind"]
        n_all = len(arr)
        nulls = arr.null_count
        st: dict = {"n": n_all - nulls, "nulls": nulls}
        out[col["name"]] = st
        if n_all == nulls:
            continue
        if kind in _INT_STAT_KINDS:
            mm = pc.min_max(arr)
            st["min"] = mm["min"].as_py()
            st["max"] = mm["max"].as_py()
            st["sum"] = _exact_int_sum(arr, st["min"], st["max"])
        elif kind == "bool":
            st["sum"] = int(pc.sum(arr.cast(pa.int64())).as_py())
        elif kind in ("float", "double"):
            mm = pc.min_max(arr)
            st["min"] = float(mm["min"].as_py())
            st["max"] = float(mm["max"].as_py())
            st["sum"] = float(pc.sum(arr).as_py())
        elif kind in ("timestamp", "timestamp_ntz", "date"):
            mm = pc.min_max(arr)
            st["min"] = int(mm["min"].value)
            st["max"] = int(mm["max"].value)
        elif kind == "decimal":
            # bounds as UNSCALED integers at the column scale: exact and
            # order-preserving under the rollup's numeric min/max (str()
            # of Decimal is NOT — the same trap _coerce_bound guards).
            # precision > 18 exceeds int64 unscaled: bounds go to the
            # wide min_dec/max_dec slots (Python big ints in the JSON;
            # the rollup carries them as decimal(38,0)) — VERDICT r3 #10.
            mm = pc.min_max(arr)
            sc = int(col.get("scale", 0))
            # wide context: default scaleb ROUNDS at 28 significant digits,
            # silently corrupting 38-digit bounds
            wide = _decimal.Context(prec=60)
            lo = int(mm["min"].as_py().scaleb(sc, wide))
            hi = int(mm["max"].as_py().scaleb(sc, wide))
            if int(col.get("precision", 38)) <= 18:
                st["min"], st["max"] = lo, hi
            else:
                st["min_dec"], st["max_dec"] = lo, hi
        elif kind in ("string", "binary"):
            nb = int(pc.sum(pc.binary_length(arr)).as_py())
            st["bytes"] = nb
            if nb <= 32 * (n_all - nulls):
                mm = pc.min_max(arr)
                lo, hi = mm["min"].as_py(), mm["max"].as_py()
                if kind == "binary":
                    lo, hi = lo.hex(), hi.hex()
                st["min"] = lo
                st["max"] = hi
    return out


def _strip_diagnostics(cols_meta: list[dict]) -> None:
    for c in cols_meta:
        c.pop("stats", None)
        c.pop("sub_encodings", None)
        if "children" in c:
            _strip_diagnostics(c["children"])


def _coerce_bound(stored, probe):
    """JSON round-trips datetimes/decimals as strings (json default=str).
    ISO timestamps/dates are fixed-width, so string comparison preserves
    order; Decimal str() is NOT order-preserving when integer-digit counts
    or signs differ ('9.50' > '10.20' lexicographically), so decimal probes
    parse the stored bound back into the numeric domain."""
    if isinstance(stored, str) and not isinstance(probe, str):
        if isinstance(probe, _decimal.Decimal):
            try:
                return _decimal.Decimal(stored), probe
            except _decimal.InvalidOperation:
                pass
        return stored, str(probe)
    return stored, probe


def select_row_groups(meta: dict, key_value=None, key_lo=None, key_hi=None,
                      ord_lo=None, ord_hi=None,
                      col_ranges: dict | None = None,
                      key_values=None) -> list[int] | None:
    """Indices of row groups whose [key_min,key_max] x [ord_min,ord_max]
    (and any `col_ranges` {column: (lo, hi)}) ranges can contain the
    predicate. `key_values` (IN-list) keeps a group when ANY key fits its
    range (and, with rg_bloom meta, passes its bloom). Conservative: a
    group with no recorded range for a probed column is kept. Returns
    None for single-group stripes (old format: nothing to skip)."""
    groups = meta.get("row_groups")
    if groups is None:
        return None
    if key_value is not None:
        key_lo = key_hi = key_value
    from goorc_spark.codecs import murmur3
    # probe-key hashes are loop-invariant: hash each key ONCE, decode each
    # group's bloom words once (not per (group, key) pair)
    key_hashes = [(kv, _rg_bloom_key_hash(kv)) for kv in key_values] \
        if key_values is not None else None
    kv_hash = _rg_bloom_key_hash(key_value) if key_value is not None \
        else None
    sel = []
    for i, g in enumerate(groups):
        ok = True
        if key_hashes is not None:
            gmin, gmax = g.get("key_min"), g.get("key_max")
            entry = g.get("key_bloom")
            bw = _rg_bloom_words(entry) if entry is not None else None
            def _fits(kv, h64):
                if gmin is not None:
                    lo, p = _coerce_bound(gmin, kv)
                    if lo > p:
                        return False
                if gmax is not None:
                    hi, p = _coerce_bound(gmax, kv)
                    if hi < p:
                        return False
                if bw is not None and not murmur3.might_contain(
                        bw, entry["k"], h64):
                    return False
                return True
            ok = any(_fits(kv, h64) for kv, h64 in key_hashes)
        if key_hi is not None and "key_min" in g and g["key_min"] is not None:
            lo, p = _coerce_bound(g["key_min"], key_hi)
            ok = ok and lo <= p
        if key_lo is not None and "key_max" in g and g["key_max"] is not None:
            hi, p = _coerce_bound(g["key_max"], key_lo)
            ok = ok and hi >= p
        if ord_hi is not None and g.get("ord_min") is not None:
            lo, p = _coerce_bound(g["ord_min"], ord_hi)
            ok = ok and lo <= p
        if ord_lo is not None and g.get("ord_max") is not None:
            hi, p = _coerce_bound(g["ord_max"], ord_lo)
            ok = ok and hi >= p
        if col_ranges:
            for cname, (vlo, vhi) in col_ranges.items():
                r = g.get("ranges", {}).get(cname)
                if r is None:
                    continue  # no stats recorded -> keep (conservative)
                if vhi is not None:
                    lo, p = _coerce_bound(r[0], vhi)
                    ok = ok and lo <= p
                if vlo is not None:
                    hi, p = _coerce_bound(r[1], vlo)
                    ok = ok and hi >= p
        if ok and kv_hash is not None and "key_bloom" in g:
            # range checks can't prune hash-placed groups (every range
            # spans the key space); the per-group bloom can
            ok = murmur3.might_contain(_rg_bloom_words(g["key_bloom"]),
                                       g["key_bloom"]["k"], kv_hash)
        if ok:
            sel.append(i)
    return sel


def _write_column(arr: pa.Array, col: dict, blob: bytearray,
                  compression: str, chunk_size: int, policy: str,
                  cache: dict | None = None) -> dict:
    """Recursive column writer: scalar kinds produce value streams; nested
    kinds (struct/list/map — the reference's C11-C13 stream compositions:
    PRESENT-only for struct, PRESENT+LENGTH for list/map,
    /root/reference/orc/column/{struct,list,map}.go) recurse into children,
    all streams appended to the same stripe blob."""
    kind = col["kind"]
    valid = _valid_mask(arr)
    has_nulls = valid is not None
    vals = arr.drop_null() if has_nulls else arr
    children_meta = None

    if kind == "struct":
        streams: list = []
        children_meta = [
            _write_column(_as_array(vals.field(i)), child, blob,
                          compression, chunk_size, policy, cache)
            for i, child in enumerate(col["children"])
        ]
        col_meta: dict = {"codec": "struct"}
    elif kind in ("list", "map"):
        lengths, kids = _list_parts(vals)
        streams = [("LENGTH", rlev2.encode(lengths, signed=False))]
        childspecs = [col["child"]] if kind == "list" \
            else [col["key"], col["value"]]
        children_meta = [
            _write_column(_as_array(kid), cs, blob, compression, chunk_size,
                          policy, cache)
            for kid, cs in zip(kids, childspecs)
        ]
        col_meta = {"codec": kind}
    else:
        streams, col_meta = _encode_column_arrow(vals, col, policy, cache)

    if has_nulls:
        streams.insert(0, ("PRESENT", boolrle.encode(valid)))
    directory = []
    for skind, raw in streams:
        comp = chunk.compress(bytes(raw), compression, chunk_size)
        directory.append(
            {"kind": skind, "offset": len(blob), "length": len(comp),
             "raw_length": len(raw)}
        )
        blob += comp
    col_meta.update(
        {"name": col["name"], "kind": kind, "has_nulls": has_nulls,
         "null_count": int(arr.null_count), "n_values": len(arr),
         "streams": directory}
    )
    if children_meta is not None:
        col_meta["children"] = children_meta
    return col_meta


def _np_int64(vals: pa.Array) -> np.ndarray:
    if len(vals) == 0:
        return np.empty(0, dtype=np.int64)
    return np.asarray(vals.cast(pa.int64(), safe=False))


def _decimal_limbs(vals: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(lo uint64, hi int64) limbs of a no-null decimal128 array, straight
    from the 16-byte little-endian values buffer — no per-row Python."""
    n = len(vals)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    if not pa.types.is_decimal(vals.type):
        raise TypeError(f"expected decimal128 array, got {vals.type}")
    raw = np.frombuffer(vals.buffers()[1], dtype=np.uint64,
                        count=2 * n, offset=16 * vals.offset).reshape(-1, 2)
    return raw[:, 0].copy(), raw[:, 1].copy().view(np.int64)


def _decimal_from_limbs(lo: np.ndarray, hi: np.ndarray,
                        present: np.ndarray | None, n_rows: int,
                        precision: int, scale: int) -> pa.Array:
    """Rebuild a decimal128 array from limbs + null mask via raw buffers."""
    if present is None:
        full_lo, full_hi, validity, nulls = lo, hi, None, 0
    else:
        full_lo = np.zeros(n_rows, dtype=np.uint64)
        full_hi = np.zeros(n_rows, dtype=np.int64)
        full_lo[present] = lo
        full_hi[present] = hi
        validity = pa.py_buffer(
            np.packbits(present, bitorder="little").tobytes())
        nulls = int((~present).sum())
    packed = np.empty((n_rows, 2), dtype=np.uint64)
    packed[:, 0] = full_lo
    packed[:, 1] = full_hi.view(np.uint64)
    return pa.Array.from_buffers(
        pa.decimal128(precision, scale), n_rows,
        [validity, pa.py_buffer(packed.tobytes())], null_count=nulls)


def _encode_column_arrow(vals: pa.Array, col: dict, policy: str,
                         cache: dict | None = None):
    kind = col["kind"]
    info: dict = {}
    if kind in INT_CAST:
        if kind == "date":  # date32 is physically int32 days — reinterpret
            v = np.asarray(vals.view(pa.int32())).astype(np.int64) \
                if len(vals) else np.empty(0, np.int64)
        else:
            v = _np_int64(vals)
        data = rlev2.encode(v, signed=True, info=info)
        return [("DATA", data)], {"codec": "rlev2", "sub_encodings": info,
                                  "stats": stx.int_stats(v)}
    if kind == "byte":
        v = _np_int64(vals)
        return [("DATA", byterle.encode(v.astype(np.uint8)))], \
            {"codec": "byte_rle", "stats": stx.int_stats(v)}
    if kind == "bool":
        v = np.asarray(vals, dtype=bool) if len(vals) else np.empty(0, bool)
        return [("DATA", boolrle.encode(v))], {"codec": "bool_rle",
                                               "stats": stx.bool_stats(v)}
    if kind == "float":
        v = np.asarray(vals, dtype=np.float32)
        return [("DATA", floats.encode_f32(v))], {"codec": "raw_f32",
                                                  "stats": stx.float_stats(v)}
    if kind == "double":
        v = np.asarray(vals, dtype=np.float64)
        return [("DATA", floats.encode_f64(v))], {"codec": "raw_f64",
                                                  "stats": stx.float_stats(v)}
    if kind in ("timestamp", "timestamp_ntz"):
        us = _np_int64(vals)
        sec, nanos = timestamps.micros_to_sec_nanos(us)
        info2: dict = {}
        d = rlev2.encode(sec, signed=True, info=info)
        s = rlev2.encode(timestamps.pack_nanos(nanos), signed=False, info=info2)
        return [("DATA", d), ("SECONDARY", s)], {
            "codec": "rlev2",
            "sub_encodings": {"seconds": info, "nanos": info2},
            "stats": {"count": int(len(us)),
                      "min_us": int(us.min()) if len(us) else None,
                      "max_us": int(us.max()) if len(us) else None},
        }
    if kind == "decimal":
        scale = int(col.get("scale", 0))
        precision = int(col.get("precision", 18))
        lo, hi = _decimal_limbs(vals)
        sec = rlev2.encode(np.full(len(lo), scale, dtype=np.int64), signed=True)
        if precision <= 18:
            # mantissa fits the low limb (reference decimal64 parity:
            # signed varint DATA + RLEv2 scale SECONDARY,
            # /root/reference/orc/column/decimal.go:32-58)
            mant64 = lo.view(np.int64)
            return [("DATA", encode_svarints(mant64)), ("SECONDARY", sec)], {
                "codec": "varint_decimal",
                "precision": precision,
                "scale": scale,
                "stats": stx.int_stats(mant64) | {"scale": scale},
            }
        # decimal128 (beyond the reference's 64-bit ceiling): two RLEv2
        # limb streams — hi signed, lo unsigned
        return [("DATA", rlev2.encode(hi, signed=True)),
                ("LO", rlev2.encode(lo, signed=False)),
                ("SECONDARY", sec)], {
            "codec": "rlev2_decimal128",
            "precision": precision,
            "scale": scale,
            "stats": {"count": int(len(lo)), "scale": scale},
        }
    if kind == "binary":
        contents, lengths = _varwidth_parts(vals)
        return [
            ("LENGTH", rlev2.encode(lengths, signed=False, info=info)),
            ("DATA", contents.tobytes()),
        ], {"codec": "raw", "stats": {"count": len(vals),
                                      "total_len": int(lengths.sum()) if len(vals) else 0}}
    if kind == "string":
        return _encode_string_arrow(vals, policy, cache, col["name"])
    raise NotImplementedError(f"column kind {kind!r}")


def _string_stats_arrow(vals: pa.Array, lengths: np.ndarray,
                        dict_arr: pa.DictionaryArray) -> dict:
    n = len(vals)
    if n == 0:
        return {"count": 0, "distinct": 0, "distinct_ratio": 0.0, "avg_len": 0.0}
    mm = pc.min_max(vals)
    mn, mx = str(mm["min"].as_py()), str(mm["max"].as_py())
    distinct = len(dict_arr.dictionary)
    return {
        "count": int(n),
        "distinct": distinct,
        "distinct_ratio": distinct / n,
        "avg_len": float(lengths.mean()) if n else 0.0,
        "max_len": int(lengths.max()) if n else 0,
        "total_len": int(lengths.sum()),
        "min": mn[:stx.MAX_STAT_STR],
        "max": mx[:stx.MAX_STAT_STR],
        "lower_bound_truncated": len(mn) > stx.MAX_STAT_STR,
        "upper_bound_truncated": len(mx) > stx.MAX_STAT_STR,
    }


def _encode_string_arrow(vals: pa.Array, policy: str,
                         cache: dict | None = None, colname: str = ""):
    info: dict = {}
    if len(vals) == 0:
        empty = np.empty(0, np.uint64)
        return [("LENGTH", rlev2.encode(empty, signed=False, info=info)),
                ("DATA", b"")], {
            "codec": "raw", "sub_encodings": info,
            "stats": {"count": 0, "distinct": 0, "distinct_ratio": 0.0,
                      "avg_len": 0.0}}
    contents, lengths = _varwidth_parts(vals)
    ckey = ("codec", colname)
    cached = cache.get(ckey) if cache is not None else None
    if cached is not None and cached != "dict":
        # cache hit on a non-dict codec: the C++ dictionary build and the
        # full min/max stats existed only to feed the selector (already
        # decided) and the diagnostics (kept for row group 0 of the first
        # stripe; stripped everywhere else) — skipping them saves ~10 ms
        # per row group on free text. Stream bytes are unchanged.
        codec = cached
        st = {
            "count": int(len(vals)),
            "avg_len": float(lengths.mean()),
            "max_len": int(lengths.max()),
            "total_len": int(lengths.sum()),
            "stats_elided_cached_codec": True,
        }
    else:
        dict_arr = _as_array(pc.dictionary_encode(vals))
        st = _string_stats_arrow(vals, lengths, dict_arr)
        if cached == "dict":
            codec = cached
            # dict stays data-dependent: fall back if cardinality exploded
            if st["distinct"] > selector.DICT_MAX_ENTRIES:
                codec = _select_codec_arrow(contents, st, policy)
        else:
            codec = _select_codec_arrow(contents, st, policy)
            if cache is not None:
                cache[ckey] = codec
    if codec == "dict":
        d = _as_array(dict_arr.dictionary)
        sort_idx = np.asarray(pc.sort_indices(d)).astype(np.int64)
        inv = np.empty(len(sort_idx), dtype=np.int64)
        inv[sort_idx] = np.arange(len(sort_idx), dtype=np.int64)
        idx = inv[np.asarray(dict_arr.indices.cast(pa.int64()))].astype(np.uint64)
        sorted_dict = _as_array(d.take(pa.array(sort_idx)))
        dcontents, dlens = _varwidth_parts(sorted_dict)
        streams = [
            ("DATA", rlev2.encode(idx, signed=False, info=info)),
            ("DICT_LENGTH", rlev2.encode(dlens, signed=False)),
            ("DICT_DATA", dcontents.tobytes()),
        ]
        return streams, {"codec": "dict", "dict_size": len(sorted_dict),
                         "sub_encodings": info, "stats": st}
    if codec == "fsst":
        table = None
        if cache is not None:
            table = cache.get(("fsst_table", colname))
        if table is None:
            # compiled once, reused across this partition's row groups /
            # stripes: the per-call LUT+hash builds were ~25% of FSST cost
            table = fsst.compile_table(fsst.train(contents.tobytes()))
            if cache is not None:
                cache[("fsst_table", colname)] = table
        data = fsst.compress(contents.tobytes(), table)
        if len(data) >= len(contents):  # stored-original fallback
            codec, data = "raw", contents.tobytes()
    else:
        data = contents.tobytes()
    streams = [
        ("LENGTH", rlev2.encode(lengths, signed=False, info=info)),
        ("DATA", data),
    ]
    return streams, {"codec": codec, "sub_encodings": info, "stats": st}


def _select_codec_arrow(contents: np.ndarray, st: dict, policy: str) -> str:
    if st["count"] == 0:
        return "raw"
    if (st["distinct_ratio"] <= selector.DICT_MAX_RATIO
            and st["distinct"] <= selector.DICT_MAX_ENTRIES):
        return "dict"
    if policy != "fast" and st["avg_len"] >= selector.FSST_MIN_AVG_LEN:
        raw = contents[:selector.FSST_SAMPLE_BYTES].tobytes()
        if len(raw) >= 1024:
            blob = fsst.compress(raw)
            if len(blob) < selector._FSST_GAIN.get(policy, 0.45) * len(raw):
                return "fsst"
    return "raw"


# ----------------------------------------------------------------- decode --


# Arrow MapArray offsets are int32 and no LargeMap type exists — a stripe
# row-group whose map children total >= this cannot be materialized
MAP_OFFSET_LIMIT = 1 << 31


def _child_offsets(lengths: np.ndarray) -> tuple[np.ndarray, bool]:
    """List/map child offsets with int64 accumulation — an int32 cumsum
    would silently wrap when a stripe's child-element total exceeds 2^31
    (latent at 256 MB stripes with small element types). Returns
    (offsets int64, wide) where wide=True means the total needs 64-bit
    offsets (LargeListArray)."""
    n = len(lengths)
    offsets64 = np.empty(n + 1, dtype=np.int64)
    offsets64[0] = 0
    np.cumsum(lengths.astype(np.int64), out=offsets64[1:])
    return offsets64, bool(offsets64[-1] >= (1 << 31))


def _decode_group(mv, cols: list[dict], n_rows: int, comp: str,
                  tz: str | None, include: list[str] | None) -> pa.RecordBatch:
    arrays, names = [], []
    for col in cols:
        if include is not None and col["name"] not in include:
            continue
        arrays.append(_read_column(mv, col, n_rows, comp, tz))
        names.append(col["name"])
    return pa.RecordBatch.from_arrays(arrays, names=names)


class CorruptStripeError(ValueError):
    """Stripe blob bytes do not match the CRC32 recorded at encode time."""


def decode_stripe_batch(blob: bytes, meta: dict,
                        tz: str | None = None,
                        include: list[str] | None = None,
                        rg_sel: list[int] | None = None,
                        verify: bool = True) -> pa.RecordBatch:
    """Decode a stripe. `include` projects columns: only the named columns'
    streams are decompressed/decoded (the reference's include-list,
    /root/reference/orc/stripe.go:246-261 — skipped columns cost nothing).
    `rg_sel` restricts a row-grouped stripe to those group indices: skipped
    groups' stream bytes are never touched (the reference's Seek/Skip,
    orc/stripe.go:369-388)."""
    if verify and "crc32" in meta and zlib.crc32(blob) != meta["crc32"]:
        raise CorruptStripeError(
            f"stripe blob CRC mismatch (expected {meta['crc32']}, got "
            f"{zlib.crc32(blob)}) — storage corruption or truncated read")
    comp = meta["compression"]
    mv = memoryview(blob)
    groups = meta.get("row_groups")
    if groups is None:
        return _decode_group(mv, meta["columns"], meta["n_rows"], comp, tz,
                             include)
    idxs = range(len(groups)) if rg_sel is None else rg_sel
    batches = [
        _decode_group(mv, groups[i]["columns"], groups[i]["n_rows"], comp,
                      tz, include)
        for i in idxs
    ]
    if not batches:
        raise ValueError("rg_sel selected no row groups")
    return pa.Table.from_batches(batches).combine_chunks().to_batches()[0] \
        if len(batches) > 1 else batches[0]


def _scatter_nulls(vals: pa.Array, present: np.ndarray | None,
                   n_rows: int) -> pa.Array:
    """Expand a compacted (non-null) array to full length with nulls at the
    not-present slots, via a C++ take with masked indices."""
    if present is None:
        return vals
    pos = np.full(n_rows, -1, dtype=np.int64)
    pos[present] = np.arange(len(vals), dtype=np.int64)
    return vals.take(pa.array(pos, mask=~present))


def _read_column(mv, col: dict, n_rows: int, comp: str,
                 tz: str | None) -> pa.Array:
    """Recursive column reader mirroring _write_column."""
    streams = {
        s["kind"]: chunk.decompress(
            bytes(mv[s["offset"]: s["offset"] + s["length"]]), comp
        )
        for s in col["streams"]
    }
    if col["has_nulls"]:
        present = boolrle.decode(streams["PRESENT"], n_rows)
        n_vals = int(present.sum())
    else:
        present = None
        n_vals = n_rows
    kind = col["kind"]
    if kind == "struct":
        children = [
            _read_column(mv, child, n_vals, comp, tz)
            for child in col["children"]
        ]
        vals = pa.StructArray.from_arrays(
            children, names=[c["name"] for c in col["children"]])
        return _scatter_nulls(vals, present, n_rows)
    if kind in ("list", "map"):
        lengths = rlev2.decode(streams["LENGTH"], n_vals, signed=False)
        offsets64, wide = _child_offsets(lengths)
        if kind == "list":
            child = _read_column(mv, col["children"][0],
                                 col["children"][0]["n_values"], comp, tz)
            if wide:
                vals = pa.LargeListArray.from_arrays(pa.array(offsets64), child)
            else:
                vals = pa.ListArray.from_arrays(
                    pa.array(offsets64.astype(np.int32)), child)
        else:
            if offsets64[-1] >= MAP_OFFSET_LIMIT:
                # lists get a LargeList fallback above int32 offsets; Arrow
                # has no LargeMap, so this is a hard ceiling (documented in
                # SCALE.md) — fail with the actionable re-encode hint
                raise ValueError(
                    f"map column {col['name']!r} has {int(offsets64[-1])} "
                    "child entries "
                    ">= 2^31 in one stripe; re-encode with a smaller "
                    "stripe_bytes/rg_rows (Arrow MapArray offsets are int32)")
            keys = _read_column(mv, col["children"][0],
                                col["children"][0]["n_values"], comp, tz)
            items = _read_column(mv, col["children"][1],
                                 col["children"][1]["n_values"], comp, tz)
            vals = pa.MapArray.from_arrays(
                pa.array(offsets64.astype(np.int32)), keys, items)
        return _scatter_nulls(vals, present, n_rows)
    return _decode_column_arrow(streams, col, n_vals, present, n_rows, tz)


def _expand(values: np.ndarray, present: np.ndarray | None, n_rows: int,
            fill=0) -> tuple[np.ndarray, np.ndarray | None]:
    """Scatter compacted values into a full-length array + null mask."""
    if present is None:
        return values, None
    full = np.full(n_rows, fill, dtype=values.dtype)
    full[present] = values
    return full, ~present


def _varwidth_array(contents: bytes, lengths: np.ndarray,
                    present: np.ndarray | None, n_rows: int,
                    typ: pa.DataType) -> pa.Array:
    """Build a large_string/large_binary array from contents+lengths without
    creating per-row Python objects."""
    if present is None:
        full_lens = np.asarray(lengths, dtype=np.int64)
        validity = None
    else:
        full_lens = np.zeros(n_rows, dtype=np.int64)
        full_lens[present] = np.asarray(lengths, dtype=np.int64)
        validity = pa.py_buffer(np.packbits(present, bitorder="little").tobytes())
    offsets = np.empty(n_rows + 1, dtype=np.int64)
    offsets[0] = 0
    np.cumsum(full_lens, out=offsets[1:])
    return pa.Array.from_buffers(
        typ, n_rows,
        [validity, pa.py_buffer(offsets.tobytes()), pa.py_buffer(contents)],
        null_count=0 if present is None else int((~present).sum()),
    )


def _decode_column_arrow(streams: dict, col: dict, n: int,
                         present: np.ndarray | None, n_rows: int,
                         tz: str | None) -> pa.Array:
    kind, codec = col["kind"], col["codec"]
    if kind in INT_CAST and kind != "date":
        v = rlev2.decode(streams["DATA"], n, signed=True)
        full, mask = _expand(v, present, n_rows)
        return pa.array(full, mask=mask).cast(_PA_BY_KIND[kind])
    if kind == "date":
        days = rlev2.decode(streams["DATA"], n, signed=True)
        full, mask = _expand(days.astype(np.int32), present, n_rows)
        return pa.array(full, mask=mask).cast(pa.date32())
    if kind == "byte":
        v = byterle.decode(streams["DATA"], n).astype(np.int8)
        full, mask = _expand(v, present, n_rows)
        return pa.array(full, mask=mask)
    if kind == "bool":
        v = boolrle.decode(streams["DATA"], n)
        full, mask = _expand(v, present, n_rows, fill=False)
        return pa.array(full, mask=mask)
    if kind == "float":
        v = floats.decode_f32(streams["DATA"], n)
        full, mask = _expand(v, present, n_rows, fill=np.float32(np.nan))
        return pa.array(full, mask=mask)
    if kind == "double":
        v = floats.decode_f64(streams["DATA"], n)
        full, mask = _expand(v, present, n_rows, fill=np.float64(np.nan))
        return pa.array(full, mask=mask)
    if kind in ("timestamp", "timestamp_ntz"):
        sec = rlev2.decode(streams["DATA"], n, signed=True)
        packed = rlev2.decode(streams["SECONDARY"], n, signed=False)
        us = timestamps.sec_nanos_to_micros(sec, timestamps.unpack_nanos(packed))
        full, mask = _expand(us, present, n_rows)
        typ = pa.timestamp("us", tz=tz) if kind == "timestamp" \
            else pa.timestamp("us")
        return pa.array(full, mask=mask).cast(typ)
    if kind == "decimal":
        precision = int(col.get("precision", 18))
        scale = int(col.get("scale", 0))
        if codec == "rlev2_decimal128":
            hi = rlev2.decode(streams["DATA"], n, signed=True)
            lo = rlev2.decode(streams["LO"], n, signed=False).view(np.uint64)
        else:
            mant, _ = decode_svarints(streams["DATA"], n)
            lo = mant.view(np.uint64)
            hi = mant >> np.int64(63)  # sign extension (-1 / 0)
        return _decimal_from_limbs(lo, hi, present, n_rows, precision, scale)
    if kind == "binary":
        lengths = rlev2.decode(streams["LENGTH"], n, signed=False)
        return _varwidth_array(streams["DATA"], lengths, present, n_rows,
                               pa.large_binary())
    if kind == "string":
        if codec == "dict":
            idx = rlev2.decode(streams["DATA"], n, signed=False)
            dlens = rlev2.decode(streams["DICT_LENGTH"], col["dict_size"],
                                 signed=False)
            entries = _varwidth_array(streams["DICT_DATA"], dlens, None,
                                      col["dict_size"], pa.large_string())
            vals = entries.take(pa.array(idx.astype(np.int64)))
            if present is None:
                return vals
            # scatter via take with null indices at null slots
            pos = np.full(n_rows, -1, dtype=np.int64)
            pos[present] = np.arange(n, dtype=np.int64)
            return vals.take(pa.array(pos, mask=~present))
        lengths = rlev2.decode(streams["LENGTH"], n, signed=False)
        data = streams["DATA"]
        if codec == "fsst":
            data = fsst.decompress(data)
        return _varwidth_array(data, lengths, present, n_rows,
                               pa.large_string())
    raise NotImplementedError(f"column kind {kind!r}")

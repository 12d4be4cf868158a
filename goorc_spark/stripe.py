"""Stripe assembly: pandas column batch <-> (blob bytes, metadata dict).

The Spark-side unit of work. One stripe = the analog of the reference's
stripe (/root/reference/orc/stripe.go:84-163): per column, 1-4 physical
streams (PRESENT / DATA / LENGTH / DICT_DATA / DICT_LENGTH / SECONDARY),
each independently passed through the chunked zlib container, concatenated
into a single blob with a JSON-able metadata "footer" (stream directory,
codec choices, column statistics) kept out-of-band as a table column.

Unlike the reference (row loop over boxed values, orc/stripe.go:37-74),
everything here is vectorized numpy/pandas over Arrow batches.

Column kinds: byte, short, int, long, bool, float, double, string, binary,
date, timestamp, decimal — the reference's fully-supported scalar set
(orc/column/package.go:69-303).
"""

from __future__ import annotations

import decimal

import numpy as np
import pandas as pd

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

INT_KINDS = {"byte", "short", "int", "long"}
_INT_DTYPE = {"short": "Int16", "int": "Int32", "long": "Int64", "byte": "Int8"}


# ---------------------------------------------------------------- encode --


def encode_stripe(
    pdf: pd.DataFrame,
    spec: list[dict],
    compression: str = chunk.DEFAULT,
    chunk_size: int = chunk.DEFAULT_CHUNK_SIZE,
    policy: str = "balanced",
) -> tuple[bytes, dict]:
    n_rows = len(pdf)
    blob = bytearray()
    cols_meta = []
    for col in spec:
        name, kind = col["name"], col["kind"]
        series = pdf[name]
        mask = series.isna().to_numpy()
        has_nulls = bool(mask.any())
        streams, col_meta = _encode_column(series, mask, col, policy)
        if has_nulls:
            streams.insert(0, ("PRESENT", boolrle.encode(~mask)))
        directory = []
        for skind, raw in streams:
            comp = chunk.compress(raw, compression, chunk_size)
            directory.append(
                {"kind": skind, "offset": len(blob), "length": len(comp),
                 "raw_length": len(raw)}
            )
            blob += comp
        col_meta.update(
            {"name": name, "kind": kind, "has_nulls": has_nulls,
             "null_count": int(mask.sum()), "streams": directory}
        )
        cols_meta.append(col_meta)
    meta = {
        "version": FORMAT_VERSION,
        "n_rows": n_rows,
        "compression": compression,
        "chunk_size": chunk_size,
        "columns": cols_meta,
    }
    return bytes(blob), meta


def _encode_column(series: pd.Series, mask: np.ndarray, col: dict,
                   policy: str = "balanced"):
    kind = col["kind"]
    vals = series[~mask] if mask.any() else series
    info: dict = {}
    if kind in INT_KINDS and kind != "byte":
        v = vals.to_numpy(dtype=np.int64, na_value=0) if len(vals) else np.empty(0, np.int64)
        data = rlev2.encode(v, signed=True, info=info)
        return [("DATA", data)], {"codec": "rlev2", "sub_encodings": info,
                                  "stats": stx.int_stats(v)}
    if kind == "byte":
        v = vals.to_numpy(dtype=np.int64) if len(vals) else np.empty(0, np.int64)
        data = byterle.encode(v.astype(np.uint8))
        return [("DATA", data)], {"codec": "byte_rle", "stats": stx.int_stats(v)}
    if kind == "bool":
        v = vals.to_numpy(dtype=bool) if len(vals) else np.empty(0, bool)
        return [("DATA", boolrle.encode(v))], {"codec": "bool_rle",
                                               "stats": stx.bool_stats(v)}
    if kind == "float":
        v = vals.to_numpy(dtype=np.float32)
        return [("DATA", floats.encode_f32(v))], {"codec": "raw_f32",
                                                  "stats": stx.float_stats(v)}
    if kind == "double":
        v = vals.to_numpy(dtype=np.float64)
        return [("DATA", floats.encode_f64(v))], {"codec": "raw_f64",
                                                  "stats": stx.float_stats(v)}
    if kind == "date":
        days = _dates_to_days(vals)
        data = rlev2.encode(days, signed=True, info=info)
        return [("DATA", data)], {"codec": "rlev2", "sub_encodings": info,
                                  "stats": stx.int_stats(days)}
    if kind in ("timestamp", "timestamp_ntz"):
        us = _ts_to_micros(vals)
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
        mant = np.array(
            [int(d.scaleb(scale).to_integral_value()) for d in vals], dtype=object
        )
        mant64 = mant.astype(np.int64)
        data = encode_svarints(mant64)
        sec = rlev2.encode(np.full(len(mant64), scale, dtype=np.int64), signed=True)
        return [("DATA", data), ("SECONDARY", sec)], {
            "codec": "varint_decimal",
            "stats": stx.int_stats(mant64) | {"scale": scale},
        }
    if kind == "binary":
        bs = list(vals) if len(vals) else []
        contents, lengths = strings.concat_utf8(bs)
        return [
            ("LENGTH", rlev2.encode(lengths, signed=False, info=info)),
            ("DATA", contents),
        ], {"codec": "raw", "stats": {"count": len(bs),
                                      "total_len": int(lengths.sum()) if len(bs) else 0}}
    if kind == "string":
        return _encode_string(vals.astype(object), policy)
    raise NotImplementedError(f"column kind {kind!r}")


def _encode_string(vals: pd.Series, policy: str = "balanced"):
    st = stx.string_stats(vals if len(vals) else pd.Series([], dtype=object))
    codec = selector.select_string_codec(vals, st, policy) if len(vals) else "raw"
    info: dict = {}
    if codec == "dict":
        idx, entries = dictionary.build(list(vals))
        dcontents, dlens = strings.concat_utf8(entries)
        streams = [
            ("DATA", rlev2.encode(idx, signed=False, info=info)),
            ("DICT_LENGTH", rlev2.encode(dlens, signed=False)),
            ("DICT_DATA", dcontents),
        ]
        return streams, {"codec": "dict", "dict_size": len(entries),
                         "sub_encodings": info, "stats": st}
    contents, lengths = strings.concat_utf8(list(vals))
    if codec == "fsst":
        data = fsst.compress(contents)
        if len(data) >= len(contents):  # stored-original fallback
            codec, data = "raw", contents
    else:
        data = contents
    streams = [
        ("LENGTH", rlev2.encode(lengths, signed=False, info=info)),
        ("DATA", data),
    ]
    return streams, {"codec": codec, "sub_encodings": info, "stats": st}


def _dates_to_days(vals) -> np.ndarray:
    if len(vals) == 0:
        return np.empty(0, dtype=np.int64)
    arr = vals.to_numpy()
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[D]").astype(np.int64)
    return np.array(list(arr), dtype="datetime64[D]").astype(np.int64)


def _ts_to_micros(vals) -> np.ndarray:
    if len(vals) == 0:
        return np.empty(0, dtype=np.int64)
    arr = vals.to_numpy()
    if not np.issubdtype(arr.dtype, np.datetime64):
        arr = pd.to_datetime(pd.Series(vals)).to_numpy()
    return arr.astype("datetime64[us]").astype(np.int64)


# ---------------------------------------------------------------- decode --


def decode_stripe(blob: bytes, meta: dict) -> pd.DataFrame:
    n_rows = meta["n_rows"]
    comp = meta["compression"]
    out = {}
    mv = memoryview(blob)
    for col in meta["columns"]:
        streams = {
            s["kind"]: chunk.decompress(
                bytes(mv[s["offset"] : s["offset"] + s["length"]]), comp
            )
            for s in col["streams"]
        }
        if col["has_nulls"]:
            present = boolrle.decode(streams["PRESENT"], n_rows)
            n_vals = int(present.sum())
        else:
            present = None
            n_vals = n_rows
        values = _decode_values(streams, col, n_vals)
        out[col["name"]] = _reassemble(values, present, n_rows, col["kind"])
    return pd.DataFrame(out)


def _decode_values(streams: dict, col: dict, n: int):
    kind, codec = col["kind"], col["codec"]
    if kind in INT_KINDS and kind != "byte":
        return rlev2.decode(streams["DATA"], n, signed=True)
    if kind == "byte":
        return byterle.decode(streams["DATA"], n).astype(np.int8)
    if kind == "bool":
        return boolrle.decode(streams["DATA"], n)
    if kind == "float":
        return floats.decode_f32(streams["DATA"], n)
    if kind == "double":
        return floats.decode_f64(streams["DATA"], n)
    if kind == "date":
        days = rlev2.decode(streams["DATA"], n, signed=True)
        return days.astype("datetime64[D]").astype(object)  # datetime.date
    if kind in ("timestamp", "timestamp_ntz"):
        sec = rlev2.decode(streams["DATA"], n, signed=True)
        packed = rlev2.decode(streams["SECONDARY"], n, signed=False)
        us = timestamps.sec_nanos_to_micros(sec, timestamps.unpack_nanos(packed))
        return us.astype("datetime64[us]")
    if kind == "decimal":
        mant, _ = decode_svarints(streams["DATA"], n)
        scales = rlev2.decode(streams["SECONDARY"], n, signed=True)
        return np.array(
            [decimal.Decimal(int(m)).scaleb(-int(s)) for m, s in zip(mant, scales)],
            dtype=object,
        )
    if kind == "binary":
        lengths = rlev2.decode(streams["LENGTH"], n, signed=False)
        return np.array(strings.split_utf8(streams["DATA"], lengths, as_str=False),
                        dtype=object)
    if kind == "string":
        if codec == "dict":
            idx = rlev2.decode(streams["DATA"], n, signed=False)
            dlens = rlev2.decode(streams["DICT_LENGTH"], col["dict_size"], signed=False)
            entries = strings.split_utf8(streams["DICT_DATA"], dlens)
            return np.array(dictionary.apply(idx, entries), dtype=object)
        lengths = rlev2.decode(streams["LENGTH"], n, signed=False)
        data = streams["DATA"]
        if codec == "fsst":
            data = fsst.decompress(data)
        return np.array(strings.split_utf8(data, lengths), dtype=object)
    raise NotImplementedError(f"column kind {kind!r}")


def _reassemble(values, present, n_rows: int, kind: str):
    if present is None:
        if kind in _INT_DTYPE:
            return pd.array(np.asarray(values, dtype=np.int64), dtype=_INT_DTYPE[kind])
        return pd.Series(values)
    if kind in _INT_DTYPE:
        full = np.zeros(n_rows, dtype=np.int64)
        full[present] = values
        arr = pd.array(full, dtype=_INT_DTYPE[kind])
        arr[~present] = pd.NA
        return arr
    if kind == "bool":
        arr = pd.array(np.zeros(n_rows, dtype=bool), dtype="boolean")
        arr[present] = values
        arr[~present] = pd.NA
        return arr
    if kind in ("float", "double"):
        full = np.full(n_rows, np.nan, dtype=np.float64 if kind == "double" else np.float32)
        full[present] = values
        return pd.Series(full)
    if kind in ("timestamp", "timestamp_ntz"):
        full = np.full(n_rows, np.datetime64("NaT"), dtype="datetime64[us]")
        full[present] = values
        return pd.Series(full)
    # object-backed kinds: string, binary, date, decimal
    full = np.full(n_rows, None, dtype=object)
    full[present] = values
    return pd.Series(full)

"""Arrow-native stripe path: roundtrips and codec selection. Wire-format
stability is pinned by the golden fixture in test_stripe.py (the retired
pandas encode path's parity role — VERDICT r2 #9)."""

import datetime
import decimal

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from goorc_spark import arrow_stripe, transcripts


def _table(pdf: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(pdf, preserve_index=False)


@pytest.fixture(scope="module")
def tx_pdf():
    return transcripts.synthesize_pandas(n_convs=300, seed=11)


def _assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame, cols):
    for c in cols:
        x, y = a[c], b[c]
        if x.dtype == object:
            assert (x.fillna("~N~") == y.fillna("~N~")).all(), c
        else:
            xa = pd.Series(x).astype("object").where(pd.notna(x), None)
            ya = pd.Series(y).astype("object").where(pd.notna(y), None)
            assert list(xa) == list(ya), c


def test_arrow_roundtrip_transcripts(tx_pdf):
    blob, meta = arrow_stripe.encode_stripe_table(
        _table(tx_pdf), transcripts.TRANSCRIPTS_SPEC)
    rb = arrow_stripe.decode_stripe_batch(blob, meta)
    out = rb.to_pandas()
    _assert_frames_equal(tx_pdf, out, ["conv_id", "turn_idx", "role", "text", "tool"])
    assert (tx_pdf["ts"].astype("datetime64[us]").astype("int64")
            == out["ts"].astype("datetime64[us]").astype("int64")).all()


ALL_KINDS_SPEC = [
    {"name": "i8", "kind": "byte"},
    {"name": "i16", "kind": "short"},
    {"name": "i32", "kind": "int"},
    {"name": "i64", "kind": "long"},
    {"name": "b", "kind": "bool"},
    {"name": "f32", "kind": "float"},
    {"name": "f64", "kind": "double"},
    {"name": "s", "kind": "string"},
    {"name": "bin", "kind": "binary"},
    {"name": "d", "kind": "date"},
    {"name": "ts", "kind": "timestamp"},
    {"name": "dec", "kind": "decimal", "precision": 12, "scale": 2},
]


@pytest.fixture(scope="module")
def all_kinds_pdf():
    rng = np.random.default_rng(5)
    n = 500
    pdf = pd.DataFrame({
        "i8": pd.array(rng.integers(-128, 127, n), dtype="Int8"),
        "i16": pd.array(rng.integers(-30000, 30000, n), dtype="Int16"),
        "i32": pd.array(rng.integers(-2**31, 2**31 - 1, n), dtype="Int32"),
        "i64": pd.array(rng.integers(-2**62, 2**62, n), dtype="Int64"),
        "b": pd.array(rng.integers(0, 2, n).astype(bool), dtype="boolean"),
        "f32": rng.normal(size=n).astype(np.float32),
        "f64": rng.normal(size=n),
        "s": pd.Series([f"val-{i % 37}" if i % 11 else f"unique-{i}-{'x' * (i % 50)}"
                        for i in range(n)], dtype=object),
        "bin": pd.Series([bytes(rng.integers(0, 256, i % 19, dtype=np.uint8).tobytes())
                          for i in range(n)], dtype=object),
        "d": pd.Series([datetime.date(1970, 1, 1) + datetime.timedelta(days=int(x))
                        for x in rng.integers(-20000, 20000, n)], dtype=object),
        "ts": pd.Series((rng.integers(0, 2**50, n)).astype("datetime64[us]")),
        "dec": pd.Series([decimal.Decimal(int(x)) / 100
                          for x in rng.integers(-10**6, 10**6, n)], dtype=object),
    })
    # nulls in every column at staggered offsets
    for j, c in enumerate(pdf.columns):
        pdf.loc[pdf.index % 13 == j, c] = None
    return pdf


def test_arrow_roundtrip_all_kinds(all_kinds_pdf):
    pdf = all_kinds_pdf
    schema = pa.schema([
        ("i8", pa.int8()), ("i16", pa.int16()), ("i32", pa.int32()),
        ("i64", pa.int64()), ("b", pa.bool_()), ("f32", pa.float32()),
        ("f64", pa.float64()), ("s", pa.string()), ("bin", pa.binary()),
        ("d", pa.date32()), ("ts", pa.timestamp("us")),
        ("dec", pa.decimal128(12, 2)),
    ])
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    blob, meta = arrow_stripe.encode_stripe_table(table, ALL_KINDS_SPEC)
    rb = arrow_stripe.decode_stripe_batch(blob, meta)
    for name in table.schema.names:
        orig = table.column(name).combine_chunks()
        got = rb.column(name)
        if name in ("f32", "f64"):
            a = orig.to_pandas(); g = got.to_pandas()
            assert np.allclose(a.dropna(), g.dropna(), rtol=0, atol=0), name
            assert a.isna().equals(g.isna()), name
        else:
            got_cast = got.cast(orig.type)
            assert got_cast.equals(orig) or got_cast.to_pylist() == orig.to_pylist(), name


def test_empty_table():
    pdf = transcripts.synthesize_pandas(n_convs=1, seed=1).iloc[:0]
    blob, meta = arrow_stripe.encode_stripe_table(
        _table(pdf), transcripts.TRANSCRIPTS_SPEC)
    rb = arrow_stripe.decode_stripe_batch(blob, meta)
    assert rb.num_rows == 0


def test_policy_fast_skips_fsst(tx_pdf):
    _, meta = arrow_stripe.encode_stripe_table(
        _table(tx_pdf), transcripts.TRANSCRIPTS_SPEC, policy="fast")
    codecs = {c["name"]: c["codec"] for c in meta["columns"]}
    assert codecs["text"] in ("raw", "dict")

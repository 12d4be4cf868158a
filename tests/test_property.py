"""Property-based round-trips (hypothesis) — decode(encode(x)) == x across
the codec kernels for arbitrary inputs. The reference has no randomized
tests (SURVEY.md §5); these pin the corner cases its hand-written vectors
miss (empty runs, extreme values, width boundaries, run-length boundaries).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from goorc_spark.codecs import boolrle, byterle, chunk, fsst, rlev2
from goorc_spark.codecs.primitives import (
    decode_svarints,
    decode_uvarints,
    encode_svarints,
    encode_uvarints,
)

_SMALL = settings(max_examples=60, deadline=None)

i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
u64 = st.integers(min_value=0, max_value=2**64 - 1)

# mixtures that exercise every RLEv2 sub-encoding: runs, monotone ramps,
# small-range values (direct), and huge outliers (patched base)
int_arrays = st.one_of(
    st.lists(i64, max_size=1300),
    st.lists(st.integers(-100, 100), max_size=1300),
    st.lists(st.sampled_from([0, 1, 7, 7, 7, 7, 1 << 40]), max_size=1300),
    st.integers(0, 1300).map(lambda n: list(range(n))),
)


@_SMALL
@given(int_arrays)
def test_rlev2_signed_roundtrip(vals):
    v = np.array(vals, dtype=np.int64)
    enc = rlev2.encode(v, signed=True)
    np.testing.assert_array_equal(rlev2.decode(enc, len(v), signed=True), v)


@_SMALL
@given(st.lists(u64, max_size=1300))
def test_rlev2_unsigned_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    enc = rlev2.encode(v, signed=False)
    np.testing.assert_array_equal(rlev2.decode(enc, len(v), signed=False), v)


@_SMALL
@given(st.lists(st.integers(0, 255), max_size=400))
def test_byterle_roundtrip(vals):
    v = np.array(vals, dtype=np.uint8)
    np.testing.assert_array_equal(byterle.decode(byterle.encode(v), len(v)), v)


@_SMALL
@given(st.lists(st.booleans(), max_size=700))
def test_boolrle_roundtrip(vals):
    v = np.array(vals, dtype=bool)
    np.testing.assert_array_equal(boolrle.decode(boolrle.encode(v), len(v)), v)


@_SMALL
@given(st.binary(max_size=5000))
def test_fsst_roundtrip(data):
    assert fsst.decompress(fsst.compress(data)) == data


@_SMALL
@given(st.binary(max_size=4000),
       st.sampled_from([chunk.ZLIB, chunk.ZSTD, chunk.LZ4, chunk.NONE]))
def test_chunk_roundtrip(data, kind):
    assert chunk.decompress(chunk.compress(data, kind, chunk_size=512), kind) == data


@_SMALL
@given(st.lists(u64, max_size=300))
def test_uvarint_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    enc = encode_uvarints(v)
    out, off = decode_uvarints(enc, len(v))
    np.testing.assert_array_equal(out, v)
    assert off == len(enc)


@_SMALL
@given(st.lists(i64, max_size=300))
def test_svarint_roundtrip(vals):
    v = np.array(vals, dtype=np.int64)
    enc = encode_svarints(v)
    out, off = decode_svarints(enc, len(v))
    np.testing.assert_array_equal(out, v)
    assert off == len(enc)


# ---- round-2 surface: row groups, decimal128, group selection ------------

dec_strings = st.decimals(
    min_value=-(10**31), max_value=10**31, places=6, allow_nan=False,
    allow_infinity=False)


@_SMALL
@given(st.lists(st.one_of(dec_strings, st.none()), max_size=400))
def test_decimal128_roundtrip_property(vals):
    import pyarrow as pa

    from goorc_spark import arrow_stripe

    t = pa.table({"d": pa.array(vals, type=pa.decimal128(38, 6))})
    spec = [{"name": "d", "kind": "decimal", "precision": 38, "scale": 6}]
    blob, meta = arrow_stripe.encode_stripe_table(t, spec)
    out = arrow_stripe.decode_stripe_batch(blob, meta)
    assert out.column("d").to_pylist() == vals


@_SMALL
@given(st.integers(1, 5000), st.integers(1, 997))
def test_rowgroup_roundtrip_property(n, rg):
    import pyarrow as pa

    from goorc_spark import arrow_stripe

    t = pa.table({
        "k": pa.array((np.arange(n) // 7).astype(np.int64)),
        "v": pa.array(np.arange(n, dtype=np.int64) * 3),
    })
    spec = [{"name": "k", "kind": "long"}, {"name": "v", "kind": "long"}]
    blob, meta = arrow_stripe.encode_stripe_table(
        t, spec, rg_rows=rg, key_col="k", ord_col="v")
    out = arrow_stripe.decode_stripe_batch(blob, meta)
    assert pa.Table.from_batches([out]).equals(t)
    # group selection is conservative: every row of a probed key survives
    probe = int(n // 14)
    sel = arrow_stripe.select_row_groups(meta, key_value=probe)
    if sel is not None:
        got = arrow_stripe.decode_stripe_batch(blob, meta, rg_sel=sel) \
            if sel else None
        import pyarrow.compute as pc
        want = int(pc.sum(pc.equal(t.column("k"), probe)).as_py() or 0)
        have = 0 if got is None else \
            int(pc.sum(pc.equal(got.column("k"), probe)).as_py() or 0)
        assert have == want


# mixed-type whole-stripe roundtrip: random rows across every scalar kind
# in one table, random row-group stride — the integration surface the
# per-codec properties above can't cover (stream directory, PRESENT
# interleaving, per-group codec restarts, selector choices)
_texts = st.lists(
    st.one_of(st.none(), st.text(max_size=40)), min_size=1, max_size=400)


@settings(max_examples=25, deadline=None)
@given(_texts, st.integers(1, 200), st.randoms(use_true_random=False))
def test_stripe_mixed_kinds_roundtrip(texts, rg, rnd):
    import pyarrow as pa

    from goorc_spark import arrow_stripe

    n = len(texts)
    ints = [rnd.choice([None, rnd.randint(-(2**31), 2**31 - 1), 7])
            for _ in range(n)]
    longs = [rnd.choice([0, 1, rnd.randint(-(2**62), 2**62)])
             for _ in range(n)]
    doubles = [rnd.choice([None, 0.0, rnd.random() * 1e12, -1.5])
               for _ in range(n)]
    bools = [rnd.choice([None, True, False]) for _ in range(n)]
    bins = [rnd.choice([None, b"", bytes([rnd.randint(0, 255)]) * rnd.randint(1, 9)])
            for _ in range(n)]
    t = pa.table({
        "s": pa.array(texts, pa.string()),
        "i": pa.array(ints, pa.int32()),
        "l": pa.array(longs, pa.int64()),
        "d": pa.array(doubles, pa.float64()),
        "b": pa.array(bools, pa.bool_()),
        "y": pa.array(bins, pa.binary()),
    })
    spec = [{"name": "s", "kind": "string"}, {"name": "i", "kind": "int"},
            {"name": "l", "kind": "long"}, {"name": "d", "kind": "double"},
            {"name": "b", "kind": "bool"}, {"name": "y", "kind": "binary"}]
    blob, meta = arrow_stripe.encode_stripe_table(t, spec, rg_rows=rg)
    out = pa.Table.from_batches(
        [arrow_stripe.decode_stripe_batch(blob, meta)])
    for name in t.column_names:
        want = t.column(name).combine_chunks()
        got = out.column(name).combine_chunks().cast(want.type)
        assert got.equals(want), name


# --------------------------------------------------- native ORC file format

def _pa_col(typ_name):
    import pyarrow as pa
    typ = {"i": pa.int64(), "s": pa.utf8(), "f": pa.float64(),
           "b": pa.bool_(), "raw": pa.binary()}[typ_name]
    return lambda v: (typ_name, __import__("pyarrow").array(v, type=typ))


_orc_scalars = st.one_of(
    st.lists(st.one_of(st.none(), i64), max_size=300).map(_pa_col("i")),
    st.lists(st.one_of(st.none(), st.text(max_size=24)),
             max_size=300).map(_pa_col("s")),
    st.lists(st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
             max_size=300).map(_pa_col("f")),
    st.lists(st.one_of(st.none(), st.booleans()),
             max_size=300).map(_pa_col("b")),
    st.lists(st.one_of(st.none(), st.binary(max_size=16)),
             max_size=300).map(_pa_col("raw")),
)


@_SMALL
@given(_orc_scalars, st.sampled_from(["none", "zlib"]),
       st.integers(1, 200))
def test_orc_native_write_read_roundtrip(named, comp, stripe_rows):
    """write_orc -> read_orc is identity for arbitrary nullable scalar
    columns under both codecs and arbitrary stripe splits, AND the bytes
    parse in pyarrow's independent C++ ORC reader."""
    import io
    import pyarrow as pa
    import pyarrow.orc as po
    from goorc_spark import orc_native as on

    name, arr = named
    t = pa.table({name: arr})
    data = on.write_orc(t, compression=comp, stripe_rows=stripe_rows)
    assert on.read_orc(data).cast(t.schema).equals(t)
    assert po.read_table(io.BytesIO(data)).cast(t.schema).equals(t)

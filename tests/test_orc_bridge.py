"""ORC interop: real ORC files in and out of the engine, cross-checked with
two independent ORC implementations (Spark's Java reader/writer and
pyarrow.orc's C++ one) — the pytest analog of the reference's interop golden
tests (/root/reference/testing/interop_reader_test.go)."""

from __future__ import annotations

import pyarrow.orc as pa_orc
import pytest

from goorc_spark import engine, orc_bridge, transcripts


@pytest.fixture()
def source(spark):
    return transcripts.transcripts_from_events(spark, "/root/testdata/sf0.001")


def _sorted_rows(df):
    return sorted(map(str, df.collect()))


def test_orc_ingest_encode_decode(spark, source, tmp_path):
    orc_in = str(tmp_path / "in_orc")
    orc_bridge.write_orc(source, orc_in)
    cfg = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              partitions=4, run_id="orcin")
    stripes = orc_bridge.encode_from_orc(spark, orc_in, cfg)
    decoded = engine.decode_df(stripes, transcripts.TRANSCRIPTS_SPEC)
    assert _sorted_rows(decoded) == _sorted_rows(source)


def test_orc_export_readable_by_pyarrow(spark, source, tmp_path):
    """Engine stripes -> ORC files that an INDEPENDENT implementation
    (pyarrow C++ ORC) reads back bit-identically."""
    import glob

    cfg = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              partitions=4, run_id="orcout")
    stripes = engine.encode_df(source, cfg)
    out = str(tmp_path / "out_orc")
    orc_bridge.export_orc(stripes, transcripts.TRANSCRIPTS_SPEC, out)
    files = sorted(glob.glob(f"{out}/*.orc"))
    assert files
    tables = [pa_orc.ORCFile(f).read() for f in files]
    n = sum(t.num_rows for t in tables)
    assert n == source.count()
    texts = sorted(x for t in tables for x in t.column("text").to_pylist())
    assert texts == sorted(r["text"] for r in source.collect())


def test_pyarrow_written_orc_ingests(spark, source, tmp_path):
    """Third-party-written ORC (pyarrow writer) -> Spark reader -> engine."""
    pdf = source.toPandas()
    f = str(tmp_path / "pa.orc")
    import pyarrow as pa

    pa_orc.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f)
    cfg = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              partitions=2, run_id="pain")
    stripes = orc_bridge.encode_from_orc(spark, f, cfg)
    decoded = engine.decode_df(stripes, transcripts.TRANSCRIPTS_SPEC)
    assert decoded.count() == source.count()
    assert _sorted_rows(decoded.select("conv_id", "turn_idx", "text")) == \
        _sorted_rows(source.select("conv_id", "turn_idx", "text"))


def test_export_orc_native_full_circle(spark, tmp_path):
    """engine stripes -> native ORC bytes -> JVM reader: no JVM ORC code
    on the write side, yet Spark's reader consumes the files."""
    from goorc_spark import engine, orc_bridge, transcripts
    df = transcripts.transcripts_from_events(spark, "/root/testdata/sf0.001")
    cfg = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              partitions=3, run_id="natexp")
    stripes = engine.encode_df(df, cfg)
    path = str(tmp_path / "native_export")
    orc_bridge.export_orc_native(stripes, transcripts.TRANSCRIPTS_SPEC, path)
    back = spark.read.orc(path)
    assert back.count() == df.count()
    want = sorted(df.select("conv_id", "turn_idx", "text").collect())
    got = sorted(back.select("conv_id", "turn_idx", "text").collect())
    assert got == want


def test_encode_from_orc_native(spark, tmp_path):
    """JVM-written ORC -> native byte decode -> engine stripes -> decode:
    ingest parity with the reference's own reader, end to end."""
    from goorc_spark import engine, orc_bridge, transcripts
    df = transcripts.transcripts_from_events(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "in_orc")
    df.write.option("compression", "zlib").orc(path)
    cfg = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              partitions=3, run_id="natin")
    stripes = orc_bridge.encode_from_orc_native(spark, path + "/*.orc", cfg)
    out = engine.decode_df(stripes, transcripts.TRANSCRIPTS_SPEC)
    assert out.count() == df.count()
    want = sorted(df.select("conv_id", "turn_idx", "text").collect())
    got = sorted(out.select("conv_id", "turn_idx", "text").collect())
    assert got == want

"""Catalog-table stripe sink/source (the Iceberg-shaped path).

The reference writes ORC *files*; our stripe table ships to either a
parquet directory or a catalog TABLE through the DataSourceV2 `writeTo`
API — the identical call shape an Iceberg sink uses once
iceberg-spark-runtime + a catalog config are on the cluster (this
container has neither, so the V2 session catalog stands in; the code
path under test is the same)."""

import uuid

import pytest

from goorc_spark import engine, transcripts


def _tbl() -> str:
    return f"default.goorc_tbl_{uuid.uuid4().hex[:10]}"


def test_is_table_target():
    assert engine._is_table_target("db.stripes")
    assert engine._is_table_target("iceberg.warehouse.stripes")
    assert engine._is_table_target("table:stripes")
    # bare relative names are PATHS — a table needs a dot or a table: prefix
    assert not engine._is_table_target("stripes")
    assert not engine._is_table_target("stripes_out")
    assert not engine._is_table_target("/tmp/stripes")
    assert not engine._is_table_target("s3://bucket/stripes")
    assert not engine._is_table_target("file:/tmp/x")
    assert not engine._is_table_target("./relative")
    assert not engine._is_table_target("~/stripes")
    assert engine._table_name("table:stripes") == "stripes"
    assert engine._table_name("db.stripes") == "db.stripes"


def test_catalog_table_roundtrip(spark):
    df = transcripts.synthesize_spark(spark, n_convs=20)
    cfg = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              partitions=4, run_id="tblio")
    stripes = engine.encode_df(df, cfg)
    tbl = _tbl()
    engine.write_encoded(stripes, tbl, mode="error")
    back = engine.read_encoded(spark, tbl)
    decoded = engine.decode_df(back, transcripts.TRANSCRIPTS_SPEC)
    assert decoded.count() == df.count()
    want = sorted(df.select("conv_id", "turn_idx", "text").collect())
    got = sorted(decoded.select("conv_id", "turn_idx", "text").collect())
    assert got == want
    # mode="error" refuses an existing table; append extends it
    with pytest.raises(ValueError, match="already exists"):
        engine.write_encoded(stripes, tbl, mode="error")
    engine.write_encoded(stripes, tbl, mode="append")
    assert engine.read_encoded(spark, tbl).count() == 2 * stripes.count()
    engine.write_encoded(stripes, tbl, mode="overwrite")
    assert engine.read_encoded(spark, tbl).count() == stripes.count()
    spark.sql(f"DROP TABLE {tbl}")


def test_resume_encode_table_target(spark):
    df = transcripts.synthesize_spark(spark, n_convs=12)
    cfg = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              partitions=3, run_id="tblresume")
    tbl = _tbl()
    first = engine.resume_encode(spark, df, tbl, cfg)
    n = first.count()
    assert n > 0
    # a second resume finds every partition present and appends nothing
    again = engine.resume_encode(spark, df, tbl, cfg)
    assert again.count() == n
    decoded = engine.decode_df(again, transcripts.TRANSCRIPTS_SPEC)
    assert decoded.count() == df.count()
    spark.sql(f"DROP TABLE {tbl}")

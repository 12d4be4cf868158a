"""Engine edge cases: empty input, null keys, all-null columns, keyless
encode — the shapes a 10^12-row ingest inevitably contains somewhere."""

from pyspark.sql import functions as F

from goorc_spark import engine

SCHEMA = "conv_id string, turn_idx int, text string"


def test_empty_input_encodes_to_zero_stripes(spark):
    empty = spark.createDataFrame([], SCHEMA)
    cfg = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              partitions=2, run_id="edge-empty")
    stripes = engine.encode_df(empty, cfg)
    assert stripes.count() == 0
    assert engine.decode_df(
        stripes, engine.spec_from_schema(empty.schema)).count() == 0


def test_null_keys_and_all_null_column_roundtrip(spark):
    rows = [(None, 1, None), (None, 2, None), ("c1", 1, None), ("c1", 2, "x")]
    df = spark.createDataFrame(rows, SCHEMA)
    cfg = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              partitions=1, run_id="edge-null")
    stripes = engine.encode_df(df, cfg)
    decoded = engine.decode_df(stripes, engine.spec_from_schema(df.schema))
    got = sorted(((r[0] or ""), r[1], (r[2] or "")) for r in decoded.collect())
    want = sorted(((r[0] or ""), r[1], (r[2] or "")) for r in rows)
    assert got == want
    # key bounds come from the non-null keys; the null-keyed rows are still
    # decodable by a full scan
    lin = stripes.select("key_min", "key_max").collect()[0]
    assert lin["key_min"] == "c1" and lin["key_max"] == "c1"


def test_keyless_encode_roundtrip(spark):
    df = spark.range(100).select(
        F.col("id").cast("long").alias("v"),
        (F.col("id") * 2).cast("double").alias("d"))
    cfg = engine.EncodeConfig(partitions=3, run_id="edge-nokey")
    stripes = engine.encode_df(df, cfg)
    decoded = engine.decode_df(stripes, engine.spec_from_schema(df.schema))
    assert sorted(r["v"] for r in decoded.collect()) == list(range(100))
    # keyless stripes carry null bounds and no bloom — prune_stripes must
    # keep every stripe (NULL bound = unknown, never a wrong skip)
    n = stripes.count()
    assert engine.prune_stripes(stripes, key_value=123).count() == n


def test_single_row_stripe(spark):
    df = spark.createDataFrame([("c9", 7, "only")], SCHEMA)
    cfg = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              partitions=1, run_id="edge-one")
    stripes = engine.encode_df(df, cfg)
    assert stripes.count() == 1
    out = engine.decode_df(stripes, engine.spec_from_schema(df.schema)).collect()
    assert [(r[0], r[1], r[2]) for r in out] == [("c9", 7, "only")]

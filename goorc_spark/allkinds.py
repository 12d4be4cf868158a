"""Every column kind through the engine behind the DuckDB oracle gate.

The reference round-trips every scalar kind through file-level e2e tests
(/root/reference/orc/file_test.go:23-82, orc/column/column_test.go:25-381);
this module is the Spark/DuckDB equivalent: a deterministic wide-typed table
derived from events.parquet covering byte, short, int(+nulls), long, bool
(+nulls), float32, double, decimal64, decimal128, date, timestamp, string
(dict + raw + nulls), binary, array<long>(+nulls), array<string>,
map<string,long>, and struct — encoded to stripes, decoded, and projected to
a comparison-stable form (nullable numerics/decimals/dates/binary stringified
AFTER the round-trip so the pandas dtype quirks of either engine can't fake
a mismatch; the encode/decode itself runs on the native types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from goorc_spark import engine


def allkinds_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic wide-typed derivation of events.parquet (no data is
    synthesized here — every value is an expression over driver testdata)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    eid = F.col("event_id")
    return ev.select(
        (eid % 200 - 100).cast("byte").alias("c_byte"),
        (eid % 60000 - 30000).cast("short").alias("c_short"),
        F.when(eid % 11 != 0, F.col("user_id").cast("int")).alias("c_int"),
        eid.alias("c_long"),
        F.when(eid % 13 != 0, eid % 3 == 0).alias("c_bool"),
        (F.col("value") * 1.5).cast("float").alias("c_float"),
        F.col("value").alias("c_double"),
        F.concat(F.lit("1"), F.lpad((eid % 100000).cast("string"), 5, "0"),
                 F.lit("."), F.lpad((eid % 100).cast("string"), 2, "0"))
            .cast("decimal(12,2)").alias("c_dec"),
        F.concat(eid.cast("string"),
                 F.repeat((eid % 10).cast("string"), 15), F.lit("."),
                 F.lpad((eid % 1000000).cast("string"), 6, "0"))
            .cast("decimal(38,6)").alias("c_dec38"),
        F.to_date("ts").alias("c_date"),
        F.col("ts").alias("c_ts"),
        F.col("event_type").alias("c_str"),
        F.when(F.col("event_type") != "error", F.col("event_type"))
            .alias("c_str_null"),
        F.col("props").alias("c_text"),
        F.encode("props", "utf-8").alias("c_bin"),
        F.when(eid % 17 != 0,
               F.array(eid, F.col("user_id"), eid % 7)).alias("c_arr_long"),
        F.split(F.col("props"), " ").alias("c_arr_str"),
        F.create_map(F.lit("a"), eid, F.lit("b"), F.col("user_id"))
            .alias("c_map"),
        F.struct(eid.alias("f1"), F.col("event_type").alias("f2"))
            .alias("c_struct"),
    )


def comparison_view(df: DataFrame) -> DataFrame:
    """Comparison-stable projection of a (decoded) allkinds table."""
    return df.select(
        "c_byte", "c_short", "c_long", "c_float", "c_double", "c_ts",
        "c_str", "c_str_null", "c_text",
        F.col("c_int").cast("string").alias("c_int_s"),
        F.col("c_bool").cast("string").alias("c_bool_s"),
        F.col("c_dec").cast("string").alias("c_dec_s"),
        F.col("c_dec38").cast("string").alias("c_dec38_s"),
        F.col("c_date").cast("string").alias("c_date_s"),
        F.hex("c_bin").alias("c_bin_hex"),
        F.array_join(F.transform("c_arr_long",
                                 lambda x: x.cast("string")), ",")
            .alias("c_arr_long_s"),
        F.array_join("c_arr_str", "|").alias("c_arr_str_s"),
        F.concat(F.lit("a="), F.col("c_map")["a"].cast("string"),
                 F.lit(";b="), F.col("c_map")["b"].cast("string"))
            .alias("c_map_s"),
        F.concat_ws("|", F.col("c_struct.f1"), F.col("c_struct.f2"))
            .alias("c_struct_s"),
    )


def allkinds_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """encode -> decode of the full-kind table, then the stable projection.
    rg_rows is set low so the row-group path is exercised under the gate."""
    wide = allkinds_from_events(spark, sf_dir)
    spec = engine.spec_from_schema(wide.schema)
    cfg = engine.EncodeConfig(key_col="c_long", order_cols=(),
                              stripe_bytes=2 * 1024 * 1024, rg_rows=1000,
                              run_id="allkinds")
    dec = engine.decode_df(engine.encode_df(wide, cfg), spec)
    return comparison_view(dec)


# DuckDB twin: the same derivation + projection computed directly on events.
ORACLE_SQL = """
SELECT CAST(event_id % 200 - 100 AS TINYINT) AS c_byte,
       CAST(event_id % 60000 - 30000 AS SMALLINT) AS c_short,
       event_id AS c_long,
       CAST(value * 1.5 AS REAL) AS c_float,
       value AS c_double,
       ts AS c_ts,
       event_type AS c_str,
       CASE WHEN event_type <> 'error' THEN event_type END AS c_str_null,
       props AS c_text,
       CASE WHEN event_id % 11 <> 0
            THEN CAST(CAST(user_id AS INTEGER) AS VARCHAR) END AS c_int_s,
       CASE WHEN event_id % 13 <> 0
            THEN CAST(event_id % 3 = 0 AS VARCHAR) END AS c_bool_s,
       CAST(CAST('1' || lpad(CAST(event_id % 100000 AS VARCHAR), 5, '0')
                 || '.' || lpad(CAST(event_id % 100 AS VARCHAR), 2, '0')
                 AS DECIMAL(12,2)) AS VARCHAR) AS c_dec_s,
       CAST(CAST(CAST(event_id AS VARCHAR)
                 || repeat(CAST(event_id % 10 AS VARCHAR), 15)
                 || '.' || lpad(CAST(event_id % 1000000 AS VARCHAR), 6, '0')
                 AS DECIMAL(38,6)) AS VARCHAR) AS c_dec38_s,
       CAST(CAST(ts AS DATE) AS VARCHAR) AS c_date_s,
       hex(encode(props)) AS c_bin_hex,
       CASE WHEN event_id % 17 <> 0
            THEN CAST(event_id AS VARCHAR) || ',' || CAST(user_id AS VARCHAR)
                 || ',' || CAST(event_id % 7 AS VARCHAR) END AS c_arr_long_s,
       replace(props, ' ', '|') AS c_arr_str_s,
       'a=' || CAST(event_id AS VARCHAR) || ';b=' || CAST(user_id AS VARCHAR)
           AS c_map_s,
       CAST(event_id AS VARCHAR) || '|' || event_type AS c_struct_s
FROM events
"""

#!/usr/bin/env python
"""Write example — the analog of the reference's examples/writer.go
(/root/reference/examples/writer.go: build a schema, write 1500 rows,
close the file). Here the "file" is a stripe table: any DataFrame
encodes in one call, the schema is taken from the frame, and parallelism
comes from Spark partitioning instead of a single-writer loop.

    python examples/writer.py [output_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/goorc_example_stripes"

    from pyspark.sql import SparkSession, functions as F

    from goorc_spark import engine

    spark = (SparkSession.builder.master("local[4]")
             .appName("goorc_example_writer")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # the reference example writes (x int, y string) rows 0..1499
    df = spark.range(1500).select(
        F.col("id").cast("int").alias("x"),
        F.concat(F.lit("string-"), F.col("id").cast("string")).alias("y"))

    cfg = engine.EncodeConfig(key_col=None, partitions=4, run_id="example")
    stripes = engine.encode_df(df, cfg)
    engine.write_encoded(stripes, out, mode="overwrite")

    lineage = engine.lineage_view(engine.read_encoded(spark, out))
    row = lineage.agg(
        F.count("*").alias("stripes"), F.sum("n_rows").alias("rows"),
        F.sum("enc_bytes").alias("enc")).collect()[0]
    print(f"wrote {row['rows']} rows in {row['stripes']} stripes "
          f"({row['enc']} encoded bytes) to {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

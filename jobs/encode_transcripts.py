#!/usr/bin/env python
"""spark-submit entry point: partition-parallel stripe-encode of a
transcripts table with lineage checkpointing and exact resume.

Packaging (north rule "ships as a spark-submit --py-files package"):

    cd <repo> && zip -qr goorc_spark.zip goorc_spark
    spark-submit --py-files goorc_spark.zip jobs/encode_transcripts.py \
        --input  s3://bucket/transcripts/          # parquet dir, or
        --table  catalog.db.transcripts            # Iceberg/catalog table
        --output s3://bucket/encoded/stripes       \
        --lineage s3://bucket/encoded/lineage      \
        --partitions 4096 --stripe-mb 256 --policy balanced --resume

On a cluster the session comes fully configured from spark-submit; this
script only declares the plan. Resume: completed partition ids are read
from the stripe sink and anti-filtered (engine.resume_encode), so an
executor-loss rerun re-encodes only the missing partitions.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet directory of the transcripts table")
    src.add_argument("--table", help="catalog table name (e.g. Iceberg)")
    p.add_argument("--output", required=True,
                   help="stripe sink: parquet dir or catalog table "
                        "(e.g. an Iceberg identifier)")
    p.add_argument("--lineage", help="optional lineage sink (parquet dir)")
    p.add_argument("--stats", help="optional per-run column-stats sink "
                   "(parquet dir; engine.run_stats rollup — the ORC "
                   "file-footer statistics analog)")
    p.add_argument("--key", default="conv_id")
    p.add_argument("--order", default="turn_idx",
                   help="comma-separated intra-key order columns")
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--stripe-mb", type=int, default=256)
    p.add_argument("--chunk-kb", type=int, default=256)
    p.add_argument("--compression", default="zstd",
                   choices=["zstd", "zlib", "lz4", "none"])
    p.add_argument("--policy", default="balanced",
                   choices=["fast", "balanced", "compact"])
    p.add_argument("--salt-threshold", type=int, default=500_000,
                   help="rows per conversation before salting kicks in")
    p.add_argument("--bucket-rows", type=int, default=250_000)
    p.add_argument("--run-id", default=None)
    p.add_argument("--resume", action="store_true",
                   help="skip partitions already present in --output")
    p.add_argument("--verify", action="store_true",
                   help="decode the written stripes and count rows (sanity)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    from goorc_spark import engine

    spark = SparkSession.builder.appName("goorc_spark_encode").getOrCreate()
    df = (spark.read.table(args.table) if args.table
          else spark.read.parquet(args.input))

    cfg = engine.EncodeConfig(
        stripe_bytes=args.stripe_mb * 1024 * 1024,
        chunk_size=args.chunk_kb * 1024,
        compression=args.compression,
        policy=args.policy,
        partitions=args.partitions,
        key_col=args.key,
        order_cols=tuple(c for c in args.order.split(",") if c),
        salt_threshold=args.salt_threshold,
        bucket_rows=args.bucket_rows,
        **({"run_id": args.run_id} if args.run_id else {}),
    )

    t0 = time.monotonic()
    if args.resume:
        stripes = engine.resume_encode(spark, df, args.output, cfg)
    else:
        stripes = engine.encode_df(df, cfg)
        engine.write_encoded(stripes, args.output, mode="error")
        stripes = engine.read_encoded(spark, args.output)
    wall = time.monotonic() - t0

    lineage = engine.lineage_view(stripes)
    if args.lineage:
        lineage.write.mode("overwrite").parquet(args.lineage)
    if args.stats:
        engine.run_stats(stripes).write.mode("overwrite").parquet(args.stats)
    from pyspark.sql import functions as F

    agg = lineage.agg(
        F.count("*").alias("stripes"), F.sum("n_rows").alias("rows"),
        F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc"),
    ).collect()[0]
    metrics = {
        "stripes": agg["stripes"], "rows": agg["rows"],
        "raw_bytes": agg["raw"], "enc_bytes": agg["enc"],
        "compression_ratio": round((agg["raw"] or 0) / max(agg["enc"] or 1, 1), 3),
        "wall_sec": round(wall, 2),
        "rows_per_sec": round((agg["rows"] or 0) / max(wall, 1e-9)),
    }
    if args.verify:
        spec = engine.spec_from_schema(df.schema)
        metrics["decoded_rows"] = engine.decode_df(stripes, spec).count()
        metrics["verify_ok"] = metrics["decoded_rows"] == metrics["rows"]
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""spark-submit entry point: merge undersized stripes (streaming-ingest
leftovers) into full-size ones — `engine.compact_stripes` as a maintenance
job.

    spark-submit --py-files goorc_spark.zip jobs/compact_stripes.py \
        --stripes s3://bucket/encoded/stripes   \
        --output  s3://bucket/encoded/compacted \
        --min-mb 128 --stripe-mb 256 --partitions 4096

Full stripes pass through from lineage alone (their blobs are never read —
the parquet scan of the stripe table prunes the blob column for the
pass-through branch); undersized ones are decoded and re-encoded under a
fresh run_id. The output is a complete, self-contained stripe table: point
reads, range scans and decode_df work on it unchanged.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

# local runs (spark-submit --py-files ships the package instead)
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stripes", required=True, help="stripe table: parquet dir or catalog table")
    p.add_argument("--output", required=True, help="compacted sink (parquet dir)")
    p.add_argument("--key", default="conv_id")
    p.add_argument("--order", default="turn_idx",
                   help="comma-separated intra-key order columns")
    p.add_argument("--partitions", type=int, default=None)
    p.add_argument("--stripe-mb", type=int, default=256)
    p.add_argument("--min-mb", type=int, default=None,
                   help="raw-size threshold below which a stripe is "
                        "recompacted (default stripe-mb/2)")
    p.add_argument("--compression", default="zstd",
                   choices=["zstd", "zlib", "lz4", "none"])
    p.add_argument("--run-id", default=None)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from pyspark.sql import SparkSession

    from goorc_spark import engine

    spark = SparkSession.builder.appName("goorc_compact").getOrCreate()
    stripes = engine.read_encoded(spark, args.stripes)
    cfg_kw = dict(
        key_col=args.key,
        order_cols=tuple(c for c in args.order.split(",") if c),
        stripe_bytes=args.stripe_mb * 1024 * 1024,
        partitions=args.partitions,
        compression=args.compression,
    )
    if args.run_id:
        cfg_kw["run_id"] = args.run_id
    cfg = engine.EncodeConfig(**cfg_kw)
    t0 = time.time()
    # schema-agnostic: the spec comes out of the stripes' own meta (the
    # stripe table is self-describing, like an ORC file footer)
    spec = engine.spec_from_stripes(stripes)
    compacted = engine.compact_stripes(
        stripes, spec, cfg,
        min_bytes=args.min_mb * 1024 * 1024 if args.min_mb else None)
    engine.write_encoded(compacted, args.output, mode="overwrite")
    out = spark.read.parquet(args.output)
    print(json.dumps({
        "stripes_in": stripes.count(), "stripes_out": out.count(),
        "rows_out": int(out.agg({"n_rows": "sum"}).first()[0]),
        "sec": round(time.time() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

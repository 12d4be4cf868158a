"""Incremental stripe encoding for streaming transcript ingest.

The reference is batch-only (SURVEY.md §2.5); at 10^12-turn scale new
conversations arrive continuously, so the engine also ships a Structured
Streaming path: readStream -> foreachBatch(stripe-encode + append). Each
micro-batch runs the same partition-parallel encode_df pipeline and writes
its stripes into a batch_id=N partition directory with dynamic partition
overwrite. foreachBatch is at-least-once, so a batch retried after a
partial/failed write REPLACES its own directory instead of appending next to
the partial output — that overwrite is what upgrades the sink to effectively
exactly-once; run_id/batch_id lineage additionally makes every stripe's
origin auditable.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from goorc_spark import engine

CONV_STATS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turns", T.LongType(), False),
    T.StructField("max_turn", T.IntegerType(), False),
    T.StructField("text_bytes", T.LongType(), False),
])

_CONV_STATE_SCHEMA = T.StructType([
    T.StructField("turns", T.LongType(), False),
    T.StructField("max_turn", T.IntegerType(), False),
    T.StructField("text_bytes", T.LongType(), False),
])


def _update_conv_state(key, pdfs: Iterator[pd.DataFrame], state):
    """Arrow-batched per-conversation accumulator (no per-row Python)."""
    turns, mx, tb = state.get if state.exists else (0, -1, 0)
    for pdf in pdfs:
        turns += len(pdf)
        if len(pdf):
            mx = max(mx, int(pdf["turn_idx"].max()))
            tb += int(pdf["text"].str.encode("utf-8").str.len().sum())
    state.update((turns, mx, tb))
    yield pd.DataFrame({"conv_id": [key[0]], "turns": [turns],
                        "max_turn": [mx], "text_bytes": [tb]})


def conv_stats_stream(stream_df: DataFrame) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): running
    per-conversation turn counts / max turn_idx / text bytes maintained
    across micro-batches. This is the ingestion-side bookkeeping a
    10^12-turn pipeline needs (which conversations are still growing, where
    the incremental encoder's resume points are) — state the batch engine's
    lineage cannot provide because it only sees completed stripes. The
    reference is batch-only; this is Spark-native surface area beyond it."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream_df.groupBy("conv_id").applyInPandasWithState(
        _update_conv_state,
        outputStructType=CONV_STATS_SCHEMA,
        stateStructType=_CONV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def window_stats_stream(stream_df: DataFrame, window: str = "1 minute",
                        watermark: str = "2 minutes") -> DataFrame:
    """Watermarked event-time windowed aggregation — the Structured
    Streaming late-data pattern (`withWatermark` + `window`) over the
    transcripts stream: per-window turn count / approximate conversation
    count / text bytes. In append mode a window emits exactly once, when
    the watermark (max observed event time minus the delay) passes its
    end; rows arriving later than the delay are dropped by the engine.
    At 10^12-turn scale this is the bounded-state ingest-rate rollup:
    state holds only the open windows, never history — unlike
    `conv_stats_stream`, whose per-conversation state grows with the key
    space. (`approx_count_distinct` because exact distinct is not
    available inside a streaming aggregation.)"""
    return (stream_df.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"))
            .agg(F.count("*").alias("turns"),
                 F.approx_count_distinct("conv_id").alias("convs"),
                 F.sum(F.octet_length("text")).alias("text_bytes"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "turns", "convs", "text_bytes"))


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
        # idempotent per batch: a retry overwrites ONLY batch_id=N
        (stripes.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(out_path))

    writer = (stream_df.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    # stash the spec so callers can decode without re-deriving
    query._goorc_spec = spec  # noqa: SLF001 - convenience attribute
    return query

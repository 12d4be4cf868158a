"""Watermarked windowed-aggregation semantics, pinned deterministically:
separate availableNow passes over the same checkpoint recover the committed
watermark, so "this row is too late" does not depend on micro-batch
scheduling inside one run."""

import datetime as dt
import shutil
import tempfile

from goorc_spark import streaming

SCHEMA = "conv_id string, turn_idx int, text string, ts timestamp"
T0 = dt.datetime(2026, 1, 1, 10, 0, 0)


def _rows(*specs):
    """Each spec = (seconds_after_T0, text_len)."""
    return [(f"c{i}", i, "x" * ln, T0 + dt.timedelta(seconds=s))
            for i, (s, ln) in enumerate(specs)]


def _run_pass(spark, src, sink, ck):
    def write_closed(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)

    q = (streaming.window_stats_stream(
            spark.readStream.schema(SCHEMA).parquet(src),
            window="1 minute", watermark="2 minutes")
         .writeStream.foreachBatch(write_closed)
         .outputMode("append").option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)


def test_window_watermark_late_drop(spark):
    base = tempfile.mkdtemp(prefix="goorc_wm_")
    src, sink, ck = f"{base}/src", f"{base}/sink", f"{base}/ck"
    try:
        # pass 1: window [10:00,10:01) gets 2 rows; a row at 10:03:30
        # drives the committed watermark to 10:01:30, so the end-of-pass
        # flush emits [10:00,10:01) as CLOSED
        spark.createDataFrame(
            _rows((10, 5), (20, 5), (210, 7)), SCHEMA) \
            .write.mode("append").parquet(src)
        _run_pass(spark, src, sink, ck)
        closed = {(r["window_start"], r["turns"], r["text_bytes"])
                  for r in spark.read.parquet(sink).collect()}
        assert (T0, 2, 10) in closed

        # pass 2 (watermark 10:01:30 recovered from the checkpoint): a row
        # at 10:00:40 lands in the already-closed window -> DROPPED by the
        # engine; a row at 10:05:50 advances the watermark to 10:03:50
        spark.createDataFrame(
            _rows((40, 9), (350, 11)), SCHEMA).write.mode("append").parquet(src)
        _run_pass(spark, src, sink, ck)

        # pass 3: a row at 10:09:00 pushes the watermark to 10:07:00; the
        # flush closes [10:03,10:04) and [10:05,10:06); [10:09,10:10) stays
        # open
        spark.createDataFrame(_rows((540, 13)), SCHEMA) \
            .write.mode("append").parquet(src)
        _run_pass(spark, src, sink, ck)

        rows = spark.read.parquet(sink).collect()
        got = {(r["window_start"], r["turns"], r["text_bytes"])
               for r in rows}
        assert got == {
            (T0, 2, 10),                                  # late row EXCLUDED
            (T0 + dt.timedelta(minutes=3), 1, 7),
            (T0 + dt.timedelta(minutes=5), 1, 11),
        }
        # append mode: each closed window emitted exactly once
        assert len(rows) == len(got)
    finally:
        shutil.rmtree(base, ignore_errors=True)

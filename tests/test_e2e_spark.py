"""End-to-end Spark tests (SURVEY.md §7.4-7.6): encode -> stripe table ->
decode, asserting the decoded table is bit-identical to the source under
stable (conv_id, turn_idx) ordering, the encoded size gate vs a
pyarrow-ORC-zlib oracle, skew salting, and lineage-based exact resume."""

import glob
import io
import json
import os

import numpy as np
import pandas as pd
import pytest

from goorc_spark import engine, transcripts
from goorc_spark.engine import EncodeConfig


def _sorted_pdf(df):
    pdf = df.toPandas()
    pdf = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    return pdf


@pytest.fixture(scope="module")
def source(spark):
    pdf = transcripts.synthesize_pandas(n_convs=120, seed=42)
    sdf = spark.createDataFrame(pdf, schema=engine.schema_from_spec(transcripts.TRANSCRIPTS_SPEC))
    sdf.cache().count()
    return sdf


def cfg(**kw):
    base = dict(key_col="conv_id", order_cols=("turn_idx",),
                stripe_bytes=256 * 1024, partitions=8)
    base.update(kw)
    return EncodeConfig(**base)


def test_roundtrip_bit_identical(spark, source):
    stripes = engine.encode_df(source, cfg())
    stripes.cache()
    decoded = engine.decode_df(stripes, transcripts.TRANSCRIPTS_SPEC)
    src = _sorted_pdf(source)
    dec = _sorted_pdf(decoded)
    assert len(dec) == len(src)
    for col in src.columns:
        a = src[col].to_numpy(dtype=object) if src[col].dtype == object else src[col].to_numpy()
        b = dec[col].to_numpy(dtype=object) if dec[col].dtype == object else dec[col].to_numpy()
        if col == "turn_idx":
            a = src[col].to_numpy(dtype=np.int64)
            b = dec[col].to_numpy(dtype=np.int64)
        np.testing.assert_array_equal(a, b, err_msg=f"column {col} not bit-identical")
    stripes.unpersist()


def test_size_gate_vs_orc_zlib_oracle(spark, source):
    """Total encoded bytes must be <= a zlib-ORC writer's output for the
    same rows (the reference writes the same format family; pyarrow.orc
    stands in as the runnable oracle — SURVEY.md §5 test plan (d))."""
    import pyarrow as pa
    import pyarrow.orc as orc

    stripes = engine.encode_df(source, cfg())
    ours = stripes.agg({"enc_bytes": "sum"}).collect()[0][0]

    pdf = _sorted_pdf(source)
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    buf = io.BytesIO()
    orc.write_table(table, buf, compression="zlib",
                    compression_block_size=256 * 1024, stripe_size=64 * 1024 * 1024)
    oracle = buf.tell()
    assert ours <= oracle, f"ours={ours} > orc-zlib oracle={oracle}"


def test_codec_selection_observable(spark, source):
    stripes = engine.encode_df(source, cfg())
    meta = json.loads(stripes.limit(1).collect()[0]["meta"])
    byname = {c["name"]: c for c in meta["columns"]}
    assert byname["role"]["codec"] == "dict"
    assert byname["tool"]["codec"] == "dict"
    assert byname["conv_id"]["codec"] == "dict"
    # turn_idx across many small conversations is a sawtooth: DIRECT
    # bit-packing is the correct greedy pick (a single mega-conversation's
    # monotone turn_idx picks delta — covered in test_salting below)
    assert byname["turn_idx"]["sub_encodings"]
    assert byname["ts"]["codec"] == "rlev2"
    assert byname["text"]["codec"] in ("fsst", "raw", "dict")


def test_salting_splits_mega_conversation(spark):
    pdf = transcripts.synthesize_pandas(n_convs=30, seed=7, mega_conv_turns=5000)
    sdf = spark.createDataFrame(pdf, schema=engine.schema_from_spec(transcripts.TRANSCRIPTS_SPEC))
    c = cfg(salt_threshold=1000, bucket_rows=500, partitions=8)
    stripes = engine.encode_df(sdf, c).cache()
    # the mega conversation must appear in >1 partition
    mega = stripes.filter("key_min <= 'conv-00000000' and key_max >= 'conv-00000000'")
    parts = {r["part_id"] for r in mega.select("part_id").collect()}
    assert len(parts) > 1, "mega-conversation was not salted across partitions"
    # and the round-trip must still be bit-identical
    decoded = engine.decode_df(stripes, transcripts.TRANSCRIPTS_SPEC)
    src = pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    dec = _sorted_pdf(decoded)
    np.testing.assert_array_equal(dec["text"].to_numpy(dtype=object),
                                  src["text"].to_numpy(dtype=object))
    np.testing.assert_array_equal(dec["ts"].to_numpy(), src["ts"].to_numpy())
    stripes.unpersist()


def test_resume_after_partial_run(spark, source, tmp_path):
    path = str(tmp_path / "stripes")
    c = cfg(run_id="resumetest")
    # simulate a partial run: encode only partitions {0,1,2} "before the crash"
    partial = engine.encode_df(source, c, pending_parts=[0, 1, 2])
    engine.write_encoded(partial, path)
    n_before = len(glob.glob(os.path.join(path, "*.parquet")))
    assert n_before > 0
    # resume: must encode only the missing partitions, then decode everything
    full = engine.resume_encode(spark, source, path, c)
    done_parts = {r[0] for r in full.select("part_id").distinct().collect()}
    assert done_parts == set(range(8))
    decoded = engine.decode_df(full, transcripts.TRANSCRIPTS_SPEC)
    assert decoded.count() == source.count()
    dec = _sorted_pdf(decoded)
    src = _sorted_pdf(source)
    np.testing.assert_array_equal(dec["text"].to_numpy(dtype=object),
                                  src["text"].to_numpy(dtype=object))
    # no duplicated partitions on a second resume (idempotent)
    again = engine.resume_encode(spark, source, path, c)
    assert again.count() == full.count()


def test_lineage_metrics(spark, source):
    stripes = engine.encode_df(source, cfg())
    lv = engine.lineage_view(stripes).toPandas()
    assert (lv["n_rows"] > 0).all()
    assert (lv["enc_bytes"] > 0).all()
    assert lv["n_rows"].sum() == source.count()
    assert (lv["compression_ratio"] > 1.0).any()


def test_events_roundtrip_generic_schema(spark):
    """The engine is schema-generic: round-trip the events table
    (bigint, timestamp, string, double)."""
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    ev = spark.read.parquet(f"{sf}/events.parquet")
    spec = engine.spec_from_schema(ev.schema)
    stripes = engine.encode_df(ev, EncodeConfig(key_col="event_id",
                                                order_cols=(), partitions=4,
                                                stripe_bytes=1 << 20))
    dec = engine.decode_df(stripes, spec).toPandas().sort_values("event_id").reset_index(drop=True)
    src = ev.toPandas().sort_values("event_id").reset_index(drop=True)
    for col in src.columns:
        np.testing.assert_array_equal(dec[col].to_numpy(), src[col].to_numpy(),
                                      err_msg=f"column {col}")


def test_media_resize_plumbing(spark):
    from goorc_spark.pipeline_ops import multimodal

    media = multimodal.synth_media_df(spark, n=16)
    out = multimodal.resize(media, out_w=4, out_h=4, fake=True)
    rows = out.collect()
    assert len(rows) == 16
    assert all(r["n_bytes"] == min(48, 256 + r["media_id"]) for r in rows)
    assert all(len(r["resized"]) == r["n_bytes"] for r in rows)
    import pytest as _pytest
    with _pytest.raises(Exception, match="imaging"):
        multimodal.resize(media, fake=False).collect()


def test_skew_detection_modes(spark):
    """ADVICE/VERDICT r2: the skew pre-pass defaults to a 1%-sample
    estimate above SALT_SAMPLE_BYTES instead of a full groupBy-count on
    every encode. Small inputs keep the exact pass; sample mode's plan
    carries a Sample node and still catches the mega-key."""
    pdf = transcripts.synthesize_pandas(n_convs=30, seed=7,
                                        mega_conv_turns=20_000)
    sdf = spark.createDataFrame(
        pdf, schema=engine.schema_from_spec(transcripts.TRANSCRIPTS_SPEC))
    c = cfg(salt_threshold=1000, bucket_rows=500, partitions=8)
    # auto on a small in-memory frame -> exact (no Sample in the plan)
    assert engine._skew_detection_mode(sdf, c) == "exact"
    exact_plan = engine._skew_counts(sdf, c, "exact") \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "Sample" not in exact_plan
    sample_plan = engine._skew_counts(sdf, c, "sample") \
        ._jdf.queryExecution().optimizedPlan().toString()
    assert "Sample" in sample_plan
    # the 20k-turn mega conversation is flagged by the 1% sample
    # (expected ~200 sampled rows vs the 1000*0.01*0.5 = 5-row cutoff)
    flagged = [r[0] for r in engine._skew_counts(sdf, c, "sample")
               .select("conv_id").collect()]
    assert "conv-00000000" in flagged
    # forced sample mode still salts + round-trips bit-identically
    c2 = cfg(salt_threshold=1000, bucket_rows=500, partitions=8,
             salt_detect="sample")
    stripes = engine.encode_df(sdf, c2).cache()
    parts = {r["part_id"] for r in stripes.filter(
        "key_min <= 'conv-00000000' and key_max >= 'conv-00000000'")
        .select("part_id").collect()}
    assert len(parts) > 1
    decoded = engine.decode_df(stripes, transcripts.TRANSCRIPTS_SPEC)
    assert decoded.count() == len(pdf)
    stripes.unpersist()


def test_driver_window_covers_every_family():
    """The driver's correctness gate records only the FIRST 50 queries()
    entries (VERDICT r4 #2): every operator family must keep at least one
    gate inside that window, and every entry needs an oracle (or a
    deliberate rows-only omission)."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod

    keys = list(entry_mod.queries().keys())
    window = set(keys[:50])
    must_have = {
        # engine + native ORC
        "transcripts_roundtrip", "allkinds_roundtrip", "orc_roundtrip",
        "orc_native_write", "orc_native_read_legacy",
        "orc_native_read_split", "orc_native_write_pushdown",
        "orc_native_row_seek", "orc_native_bloom_eq",
        "orc_union_roundtrip",
        "decode_projection", "point_lookup", "point_lookup_multi",
        "row_seek", "compact_roundtrip", "range_scan", "encode_lineage",
        "run_stats_allkinds", "stream_conv_stats", "stream_window_stats",
        # dedup / similarity (scale paths)
        "dedup_exact", "dedup_keep_lsh", "dedup_components",
        "dedup_minhash_lsh", "dedup_verify_lsh", "dedup_simhash_near",
        "dedup_embedding_lsh", "ann_cosine_topk", "ann_lsh_topk",
        "ann_ivf_topk", "ann_ivf_trained", "ann_pairwise_topk_lsh",
        "dedup_decontaminate",
        # sampling / text / media (the 7 rows that fell out in r4)
        "sample_split", "sample_stratified", "sample_pack",
        "text_token_stats", "text_bpe_tokens", "text_quality_score",
        "text_lang_id", "text_fingerprint", "text_repetition",
        "text_redact_pii", "media_extract_features", "media_frame_sample",
        "media_resize",
    }
    missing = must_have - window
    assert not missing, f"families outside the driver window: {missing}"
    oracles = entry_mod.oracle_sql()
    assert not [k for k in keys if k not in oracles], "query without oracle"

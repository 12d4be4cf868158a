"""Per-stripe Bloom filter on the key column (the ORC spec's bloom-filter
index idea — pb/orc_proto.proto BloomFilter — lifted to stripe granularity):
under hash partitioning every stripe's [key_min, key_max] spans the key
space, so range pruning keeps everything; the bloom is what skips stripes.
"""

from __future__ import annotations

import pytest

from goorc_spark import engine, transcripts

pytestmark = pytest.mark.usefixtures("spark")


def _hash_stripes(spark, n_convs=60):
    pdf = transcripts.synthesize_pandas(n_convs=n_convs, seed=21)
    df = spark.createDataFrame(pdf)
    cfg = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              stripe_bytes=64 * 1024, partitions=6,
                              run_id="bloom", range_partition=False)
    return pdf, engine.encode_df(df, cfg).cache()


def test_bloom_positions_deterministic():
    a = engine.bloom_positions("conv-00000007")
    assert a == engine.bloom_positions("conv-00000007")
    assert len(a) == engine.BLOOM_K
    assert all(0 <= p < engine.BLOOM_BITS for p in a)
    assert a != engine.bloom_positions("conv-00000008")


def test_bloom_prunes_hash_partitioned_stripes(spark):
    pdf, stripes = _hash_stripes(spark)
    total = stripes.count()
    key = sorted(pdf["conv_id"].unique())[3]
    pruned = engine.prune_stripes(stripes, key_value=key)
    kept = pruned.count()
    # hash partitioning: range pruning alone keeps ~everything; the bloom
    # must cut the candidate set hard (the key lives in ~1 partition's
    # stripes) while never dropping a covering stripe
    assert kept < total / 2
    rows = engine.decode_df(pruned, transcripts.TRANSCRIPTS_SPEC) \
        .filter(f"conv_id = '{key}'").count()
    assert rows == int((pdf["conv_id"] == key).sum())
    assert rows > 0


def test_bloom_never_false_negative_for_any_key(spark):
    pdf, stripes = _hash_stripes(spark, n_convs=30)
    per_key = pdf.groupby("conv_id").size()
    for key, want in list(per_key.items())[::5]:
        got = engine.decode_df(
            engine.prune_stripes(stripes, key_value=key),
            transcripts.TRANSCRIPTS_SPEC).filter(f"conv_id = '{key}'").count()
        assert got == want, key


# lexicographically INSIDE every stripe's [key_min, key_max] under hash
# partitioning, but present in no stripe — only the bloom can prune it
ABSENT_IN_RANGE = "conv-00000010-missing"


def test_bloom_absent_key_prunes_everything(spark):
    _, stripes = _hash_stripes(spark)
    kept = engine.prune_stripes(stripes, key_value=ABSENT_IN_RANGE).count()
    assert kept <= 1  # false positives allowed, expected ~0


def test_bloom_null_column_keeps_stripes(spark):
    """Legacy stripe tables without a bloom (or keyless encodes) must never
    be skipped by the probe."""
    import pyspark.sql.functions as F

    _, stripes = _hash_stripes(spark, n_convs=30)
    k = ABSENT_IN_RANGE
    range_only = stripes.filter(
        (F.col("key_min") <= k) & (F.col("key_max") >= k)).count()
    assert range_only > 0  # the key is inside some stripes' ranges
    legacy = stripes.drop("key_bloom")
    assert engine.prune_stripes(legacy, key_value=k).count() == range_only
    nulled = stripes.withColumn("key_bloom", F.lit(None).cast("binary"))
    assert engine.prune_stripes(nulled, key_value=k).count() == range_only


def test_compact_stripes_merges_and_roundtrips(spark):
    """Streaming-shaped tiny stripes -> compact -> fewer stripes, identical
    rows, and untouched big stripes pass through without a decode."""
    import pyspark.sql.functions as F

    pdf = transcripts.synthesize_pandas(n_convs=80, seed=31)
    df = spark.createDataFrame(pdf)
    tiny = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                               stripe_bytes=32 * 1024, partitions=16,
                               run_id="pre")
    stripes = engine.encode_df(df, tiny).cache()
    n_before = stripes.count()
    big = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              stripe_bytes=8 * 1024 * 1024, partitions=2,
                              run_id="post")
    compacted = engine.compact_stripes(
        stripes, transcripts.TRANSCRIPTS_SPEC, big).cache()
    n_after = compacted.count()
    assert n_after < n_before / 3
    got = engine.decode_df(compacted, transcripts.TRANSCRIPTS_SPEC) \
        .orderBy("conv_id", "turn_idx").toPandas()
    want = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["text"].tolist() == want["text"].tolist()
    assert len(got) == len(want)
    # all recoded stripes carry the new run_id; lineage still queryable
    assert compacted.filter(F.col("run_id") == "post").count() == n_after \
        or compacted.filter(F.col("run_id") == "pre").count() > 0


def test_decode_coerces_schema_drift(spark):
    """Stripes written under a LongType turn_idx (pandas int64 inferred as
    bigint) must decode AND row-access under the canonical int32 spec —
    regression for ArrowColumnVector.getInt throwing on a long vector."""
    pdf = transcripts.synthesize_pandas(n_convs=10, seed=5)
    pdf = pdf.assign(turn_idx=pdf["turn_idx"].astype("int64"))
    df = spark.createDataFrame(pdf)
    assert dict(df.dtypes)["turn_idx"] == "bigint"
    cfg = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              stripe_bytes=1 << 20, partitions=2, run_id="dr")
    stripes = engine.encode_df(df, cfg)
    dec = engine.decode_df(stripes, transcripts.TRANSCRIPTS_SPEC)
    # groupBy forces row access through the arrow vector (the old failure)
    assert dec.groupBy("turn_idx").count().count() > 0
    assert dict(dec.dtypes)["turn_idx"] == "int"


def test_read_rows_id_pushdown_from_file_scan(spark, tmp_path):
    """From a parquet stripe table, read_rows must re-scan with a
    stripe_id IN (...) predicate (parquet-pushable) instead of filtering
    bloom/range expressions after reading blob bytes."""
    pdf, stripes = _hash_stripes(spark, n_convs=40)
    path = str(tmp_path / "stripes")
    stripes.write.mode("overwrite").parquet(path)
    st = spark.read.parquet(path)
    assert engine._is_bare_scan(st)
    assert not engine._is_bare_scan(stripes)  # derived frame: no pushdown
    key = sorted(pdf["conv_id"].unique())[7]
    out = engine.read_rows(st, transcripts.TRANSCRIPTS_SPEC, "conv_id", key)
    assert out.count() == int((pdf["conv_id"] == key).sum())
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the id predicate must reach the parquet scan's DataFilters (Catalyst
    # simplifies a 1-element isin to EqualTo)
    assert "DataFilters: [isnotnull(stripe_id" in plan, plan[:800]


def test_read_where_id_pushdown_from_file_scan(spark, tmp_path):
    """Range scan from parquet: non-covering stripes are dropped via a
    meta-only first pass and a pushed stripe_id filter (no blob reads)."""
    import pandas as pd

    pdf = transcripts.synthesize_pandas(n_convs=60, seed=41)
    df = spark.createDataFrame(pdf)
    cfg = engine.EncodeConfig(key_col="conv_id", order_cols=("turn_idx",),
                              stripe_bytes=64 * 1024, partitions=6,
                              rg_rows=200, run_id="rw",
                              range_partition=True)
    path = str(tmp_path / "stripes")
    engine.encode_df(df, cfg).write.parquet(path)
    st = spark.read.parquet(path)
    lo, hi = "conv-00000005", "conv-00000008"
    out = engine.read_where(st, transcripts.TRANSCRIPTS_SPEC, "conv_id",
                            lo=lo, hi=hi)
    want = pdf[(pdf.conv_id >= lo) & (pdf.conv_id <= hi)]
    assert out.count() == len(want)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert ("DataFilters: [stripe_id" in plan
            or "DataFilters: [isnotnull(stripe_id" in plan), plan[:800]


def test_build_bloom_matches_scalar():
    """The vectorized FNV bloom builder is bit-exact with the scalar
    probe math (encode writes with the former, queries probe with the
    latter — a single differing bit would wrongly skip a stripe)."""
    vals = (["conv-%08d" % i for i in range(2000)]
            + list(range(-50, 4000, 7)) + ["", "é漢字", "x" * 300])
    got = engine._build_bloom(vals)
    bits = bytearray(engine.BLOOM_BITS // 8)
    for v in vals:
        for p in engine.bloom_positions(v):
            bits[p >> 3] |= 1 << (p & 7)
    assert got == bytes(bits)
    assert engine._build_bloom([None]) == bytes(engine.BLOOM_BITS // 8)
    assert engine._build_bloom([None, 7]) == engine._build_bloom([7])


def test_build_bloom_canonical_equal_values():
    """ADVICE r4: equal-comparing values must probe the same bits —
    Decimal('1.50') vs Decimal('1.5'), tz-aware instants in different
    zones, 1.0 vs 1 — or the bloom falsely prunes and reads silently drop
    matching rows."""
    import datetime as dt
    from decimal import Decimal

    from goorc_spark.codecs.primitives import canonical_key_bytes

    pairs = [
        (Decimal("1.50"), Decimal("1.5")),
        (Decimal("100"), Decimal("1E+2")),
        (Decimal("5.00"), 5),
        (1.0, 1),
        (True, 1),
        (dt.datetime(2020, 1, 1, 12, tzinfo=dt.timezone.utc),
         dt.datetime(2020, 1, 1, 4,
                     tzinfo=dt.timezone(dt.timedelta(hours=-8)))),
    ]
    for a, b in pairs:
        assert a == b, (a, b)
        assert canonical_key_bytes(a) == canonical_key_bytes(b), (a, b)
        assert engine.bloom_positions(a) == engine.bloom_positions(b), (a, b)
    # unequal values still (overwhelmingly) hash apart
    assert canonical_key_bytes(Decimal("1.5")) != canonical_key_bytes(
        Decimal("1.51"))


def test_build_bloom_long_outlier_bounded_memory():
    """ADVICE r4: one long key among many short ones must not allocate an
    n x max_len padded matrix; the scalar-cutoff + bucketed path stays
    bit-exact with the scalar probes."""
    vals = ["conv-%06d" % i for i in range(5000)] + ["z" * 200_000, ""]
    got = engine._build_bloom(vals)
    bits = bytearray(engine.BLOOM_BITS // 8)
    for v in vals:
        for p in engine.bloom_positions(v):
            bits[p >> 3] |= 1 << (p & 7)
    assert got == bytes(bits)


def test_rg_bloom_key_hash_canonical_decimal():
    """Row-group bloom probes share the canonical key bytes (false-prune
    regression for Decimal/tz-aware keys)."""
    from decimal import Decimal

    from goorc_spark import arrow_stripe

    assert (arrow_stripe._rg_bloom_key_hash(Decimal("2.50"))
            == arrow_stripe._rg_bloom_key_hash(Decimal("2.5")))
    assert (arrow_stripe._rg_bloom_key_hash(Decimal("3"))
            == arrow_stripe._rg_bloom_key_hash(3))

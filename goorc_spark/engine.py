"""Spark pipeline: partition-parallel stripe encode/decode with skew salting
and lineage-based exact resume.

Architecture (SURVEY.md §3.1 re-architected Spark-first): the reference's
single-threaded writer row-loop (/root/reference/orc/writer.go:67 "cannot
used concurrently") becomes
    df.repartition(N, key, salt).sortWithinPartitions(key, order)
      .mapInArrow(encode_stripes)
— all parallelism comes from Spark partitioning; each task emits one stripe
row (blob + metadata + lineage) per ~stripe_bytes of input. Everything
relational stays in Catalyst (shuffle, sort, AQE); all encoding runs inside
Arrow-native UDFs on RecordBatch buffers — no per-row Python anywhere.

Skew: mega-conversations (>salt_threshold rows) are split into salt buckets
by floor(order_col / bucket_rows) — deterministic, no window function, and
intra-bucket order is preserved so decode + sort restores the exact source
order (bit-identical round-trip).

Resume: Spark hash-partitioning is deterministic (pmod(murmur3(cols), n)),
so lineage records completed partition ids; a resumed run recomputes each
row's partition id with F.hash and anti-filters completed ones. Task-commit
atomicity of the parquet sink guarantees lineage rows only exist for fully
encoded partitions.
"""

from __future__ import annotations

import json
import re
import time
import uuid
from dataclasses import dataclass, field

import numpy as np
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from goorc_spark.codecs import chunk

SALT_COL = "__gsalt"

def stripe_schema(key_type: T.DataType | None = None) -> T.StructType:
    """Stripe-table schema; key_min/key_max carry the key column's NATIVE
    type so prune_stripes comparisons are typed (a stringified int key would
    compare lexicographically and prune wrong stripes)."""
    kt = key_type or T.StringType()
    return T.StructType([
        T.StructField("stripe_id", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("seq", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("raw_bytes", T.LongType(), False),
        T.StructField("enc_bytes", T.LongType(), False),
        T.StructField("key_min", kt, True),
        T.StructField("key_max", kt, True),
        T.StructField("key_bloom", T.BinaryType(), True),
        T.StructField("encode_ms", T.DoubleType(), False),
        T.StructField("meta", T.StringType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ])


STRIPE_SCHEMA = stripe_schema()

# Per-stripe Bloom filter over the DISTINCT key values (the ORC spec's
# bloom-filter index, lifted to stripe granularity): fixed m so the query
# side can precompute its k probe positions once and test them with pure
# built-ins (no UDF — the filter pushes into the stripe-table parquet scan).
# 64 Kbit / k=6: ~0% false positives at 1k distinct keys per stripe, ~6% at
# 50k; a saturated filter only costs a wasted read, never a wrong skip.
BLOOM_BITS = 1 << 16
BLOOM_K = 6
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_U64 = (1 << 64) - 1


def _bloom_hashes(key_bytes: bytes) -> tuple[int, int]:
    """Two 64-bit FNV-1a hashes of the canonical key bytes — h2 forced odd
    so Kirsch-Mitzenmacher double hashing cycles all positions."""
    h1 = _FNV_OFFSET
    for b in key_bytes:
        h1 = ((h1 ^ b) * _FNV_PRIME) & _U64
    h2 = h1
    for b in b"goorc-bloom":
        h2 = ((h2 ^ b) * _FNV_PRIME) & _U64
    return h1, h2 | 1


def bloom_positions(key_value) -> list[int]:
    """The k probe bit positions for a key (same math at encode and query;
    canonical_key_bytes so equal-comparing Decimal/datetime/float forms
    probe the same bits — ADVICE r4)."""
    from goorc_spark.codecs.primitives import canonical_key_bytes

    h1, h2 = _bloom_hashes(canonical_key_bytes(key_value))
    return [(h1 + i * h2) % BLOOM_BITS for i in range(BLOOM_K)]


def _build_bloom(values) -> bytes:
    """Stripe bloom bytes, vectorized (VERDICT r3 #7 — this was the last
    Python loop in the encode hot path): the FNV-1a chain is sequential in
    one key's BYTES but independent across keys, so iterate over byte
    POSITIONS (max key length, ~13 for conv ids) with every key as a
    uint64 lane. numpy uint64 arithmetic wraps mod 2^64, which is exactly
    the scalar (& _U64) math; bit-exact with bloom_positions, pinned by
    tests/test_bloom.py::test_build_bloom_matches_scalar. Keys are hashed
    in length buckets (4x geometric) so the padded matrix's width tracks
    the bucket max, not one long outlier value (ADVICE r4: a single 10 MB
    key among 50k short ones must not allocate n * max_len bytes)."""
    from goorc_spark.codecs.primitives import canonical_key_bytes

    enc = [canonical_key_bytes(v) for v in values if v is not None]
    if not enc:
        return bytes(BLOOM_BITS // 8)
    n = len(enc)
    lens = np.fromiter((len(b) for b in enc), np.int64, count=n)
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    h1 = np.empty(n, dtype=np.uint64)
    long = lens > _BLOOM_SCALAR_CUTOFF
    if long.any():  # scalar loop beats a 1-lane numpy per-byte loop
        h1[long] = [_bloom_hashes(bytes(flat[s:s + l]))[0]
                    for s, l in zip(starts[long], lens[long])]
    max_len = int(lens[~long].max()) if (~long).any() else 0
    lo, hi = -1, max(64, _BLOOM_MAT_BUDGET // max(n, 1))
    while lo < max_len:
        m = (lens > lo) & (lens <= hi) & ~long
        if m.any():
            h1[m] = _fnv1a_block(flat, starts[m], lens[m])
        lo, hi = hi, hi * 4
    prime = np.uint64(_FNV_PRIME)
    h2 = h1.copy()
    for b in b"goorc-bloom":
        h2 = (h2 ^ np.uint64(b)) * prime
    h2 |= np.uint64(1)
    bits = np.zeros(BLOOM_BITS, dtype=bool)
    for i in range(BLOOM_K):
        bits[(h1 + np.uint64(i) * h2) % np.uint64(BLOOM_BITS)] = True
    return np.packbits(bits, bitorder="little").tobytes()


_BLOOM_MAT_BUDGET = 64 << 20   # bytes per padded matrix pass
_BLOOM_SCALAR_CUTOFF = 16_384  # keys longer than this hash via the scalar
                               # loop (few lanes x huge width loses to it)


def _fnv1a_block(flat: np.ndarray, starts: np.ndarray,
                 lens: np.ndarray) -> np.ndarray:
    """One padded-matrix FNV-1a pass over values of similar length."""
    n = len(lens)
    width = int(lens.max())
    valid = np.arange(width)[None, :] < lens[:, None]
    mat = np.zeros((n, width), dtype=np.uint8)
    idx = starts[:, None] + np.arange(width)[None, :]
    mat[valid] = flat[idx[valid]]
    prime = np.uint64(_FNV_PRIME)
    h1 = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    for j in range(width):
        m = valid[:, j]
        h1[m] = (h1[m] ^ mat[m, j].astype(np.uint64)) * prime
    return h1


@dataclass
class EncodeConfig:
    stripe_bytes: int = 8 * 1024 * 1024   # raw bytes per stripe (256 MB in prod)
    chunk_size: int = chunk.DEFAULT_CHUNK_SIZE
    compression: str = chunk.DEFAULT       # zstd outer layer (zlib = parity mode)
    policy: str = "balanced"               # string-codec cost policy (selector.POLICIES)
    partitions: int | None = None          # default: spark.sql.shuffle.partitions
    key_col: str | None = None             # co-location / lineage key (conv_id)
    order_cols: tuple = ()                 # stable intra-key order (turn_idx)
    salt_threshold: int = 500_000          # rows per key before salting kicks in
    bucket_rows: int = 250_000             # rows per salt bucket
    salt_detect: str = "auto"              # skew pre-pass: exact | sample | auto
                                           # (auto = 1% sample above
                                           # SALT_SAMPLE_BYTES of input)
    range_partition: bool = False          # range-cluster by key (narrow stripe
                                           # key ranges -> prune_stripes works)
    rg_rows: int = 10_000                  # row-group stride: intra-stripe seek
                                           # granularity (reference index stride,
                                           # /root/reference/orc/config/opts.go:19);
                                           # 0 disables (one group per stripe)
    rg_bloom: float | None = None          # per-ROW-GROUP key bloom fpp (e.g.
                                           # 0.01); the group-level twin of the
                                           # stripe bloom — the only group
                                           # pruner under hash placement, where
                                           # group [key_min,key_max] ranges all
                                           # span the key space. None = off
                                           # (meta bytes unchanged)
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])

    def __post_init__(self) -> None:
        chunk.validate_chunk_size(self.chunk_size)


# ------------------------------------------------------------ schema spec --

_SPARK_TO_KIND = {
    T.ByteType: "byte", T.ShortType: "short", T.IntegerType: "int",
    T.LongType: "long", T.BooleanType: "bool", T.FloatType: "float",
    T.DoubleType: "double", T.StringType: "string", T.BinaryType: "binary",
    T.DateType: "date", T.TimestampType: "timestamp",
    T.TimestampNTZType: "timestamp_ntz",
}

_KIND_TO_SPARK = {
    "byte": T.ByteType(), "short": T.ShortType(), "int": T.IntegerType(),
    "long": T.LongType(), "bool": T.BooleanType(), "float": T.FloatType(),
    "double": T.DoubleType(), "string": T.StringType(), "binary": T.BinaryType(),
    "date": T.DateType(), "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
}


def _spec_from_type(name: str, dt: T.DataType) -> dict:
    if isinstance(dt, T.DecimalType):
        return {"name": name, "kind": "decimal",
                "precision": dt.precision, "scale": dt.scale}
    if isinstance(dt, T.ArrayType):
        return {"name": name, "kind": "list",
                "child": _spec_from_type("item", dt.elementType)}
    if isinstance(dt, T.MapType):
        return {"name": name, "kind": "map",
                "key": _spec_from_type("key", dt.keyType),
                "value": _spec_from_type("value", dt.valueType)}
    if isinstance(dt, T.StructType):
        return {"name": name, "kind": "struct",
                "children": [_spec_from_type(f.name, f.dataType)
                             for f in dt.fields]}
    if isinstance(dt, (T.VarcharType, T.CharType)):
        # reference falls through CHAR/VARCHAR to the string writer
        # (/root/reference/orc/column/package.go:224-235)
        return {"name": name, "kind": "string"}
    if type(dt) in _SPARK_TO_KIND:
        return {"name": name, "kind": _SPARK_TO_KIND[type(dt)]}
    raise NotImplementedError(f"unsupported Spark type {dt} for {name}")


def spec_from_schema(schema: T.StructType) -> list[dict]:
    return [_spec_from_type(f.name, f.dataType) for f in schema.fields]


def _type_from_spec(col: dict) -> T.DataType:
    kind = col["kind"]
    if kind == "decimal":
        return T.DecimalType(col["precision"], col["scale"])
    if kind == "list":
        return T.ArrayType(_type_from_spec(col["child"]))
    if kind == "map":
        return T.MapType(_type_from_spec(col["key"]),
                         _type_from_spec(col["value"]))
    if kind == "struct":
        return T.StructType([
            T.StructField(c["name"], _type_from_spec(c), True)
            for c in col["children"]])
    return _KIND_TO_SPARK[kind]


def schema_from_spec(spec: list[dict]) -> T.StructType:
    return T.StructType([
        T.StructField(col["name"], _type_from_spec(col), True)
        for col in spec])


def _spec_of_colmeta(c: dict) -> dict:
    out = {"name": c["name"], "kind": c["kind"]}
    if c["kind"] == "decimal":
        out["precision"] = int(c.get("precision", 18))
        out["scale"] = int(c.get("scale", 0))
    elif c["kind"] == "struct":
        out["children"] = [_spec_of_colmeta(k) for k in c["children"]]
    elif c["kind"] == "list":
        out["child"] = _spec_of_colmeta(c["children"][0])
    elif c["kind"] == "map":
        out["key"] = _spec_of_colmeta(c["children"][0])
        out["value"] = _spec_of_colmeta(c["children"][1])
    return out


def spec_from_stripes(stripes: DataFrame) -> list[dict]:
    """Recover the column spec from a stripe's embedded meta — the analog of
    the reference reading schemas out of the file footer
    (/root/reference/orc/reader.go:254-343). One driver-side read of a
    single meta JSON; blob bytes untouched. Makes maintenance jobs
    (compaction, decode CLIs) schema-agnostic: the stripe table is
    self-describing."""
    row = stripes.select("meta").limit(1).collect()
    if not row:
        raise ValueError("empty stripe table: no meta to derive a spec from")
    meta = json.loads(row[0][0])
    cols = meta.get("columns") or meta["row_groups"][0]["columns"]
    return [_spec_of_colmeta(c) for c in cols]


# ----------------------------------------------------------------- encode --


def _make_encoder(spec: list[dict], cfg: EncodeConfig):
    """Arrow-native encoder for mapInArrow: accumulates RecordBatches to the
    stripe budget, encodes via arrow_stripe (zero-copy buffer extraction, no
    per-row Python), emits one stripe row per flush."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from goorc_spark import arrow_stripe

    key = cfg.key_col
    ordc = cfg.order_cols[0] if cfg.order_cols else None
    names = [c["name"] for c in spec]

    def encode_stripes(batches):
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else -1
        pending: list = []
        pending_bytes = 0
        seq = 0
        codec_cache: dict = {}  # per-task: codec choices + FSST tables

        def flush():
            nonlocal pending, pending_bytes, seq
            if not pending:
                return None
            t0 = time.monotonic()
            table = pa.Table.from_batches(pending)
            raw_bytes = pending_bytes  # summed per input batch
            pending, pending_bytes = [], 0
            blob, meta = arrow_stripe.encode_stripe_table(
                table, spec, compression=cfg.compression,
                chunk_size=cfg.chunk_size, policy=cfg.policy,
                cache=codec_cache, rg_rows=cfg.rg_rows,
                key_col=key, ord_col=ordc, rg_bloom=cfg.rg_bloom)
            ms = (time.monotonic() - t0) * 1000
            if key and table.num_rows:
                # TRUE stripe key bounds (pc.min_max), valid even when the
                # partition isn't sorted — first/last-row bounds would make
                # prune_stripes silently drop covering stripes
                mm = pc.min_max(table.column(key))
                kmin = pa.array([mm["min"].as_py()], type=table.column(key).type)
                kmax = pa.array([mm["max"].as_py()], type=table.column(key).type)
                # bloom over DISTINCT keys (few per stripe: rows cluster by
                # key) — lets point reads skip hash-partitioned stripes
                # whose [key_min, key_max] spans the whole key space
                bloom = _build_bloom(pc.unique(table.column(key)).to_pylist())
            else:
                kmin = kmax = pa.array([None], pa.string())
                bloom = None
            row = pa.RecordBatch.from_pydict({
                "stripe_id": [f"{cfg.run_id}-p{part_id:05d}-s{seq:05d}"],
                "run_id": [cfg.run_id],
                "part_id": pa.array([part_id], pa.int32()),
                "seq": pa.array([seq], pa.int32()),
                "n_rows": pa.array([table.num_rows], pa.int64()),
                "raw_bytes": pa.array([raw_bytes], pa.int64()),
                "enc_bytes": pa.array([len(blob)], pa.int64()),
                "key_min": kmin,
                "key_max": kmax,
                "key_bloom": pa.array([bloom], pa.binary()),
                "encode_ms": pa.array([ms], pa.float64()),
                "meta": [json.dumps(meta, default=str)],
                "blob": pa.array([blob], pa.binary()),
            })
            seq += 1
            return row

        for rb in batches:
            if rb.num_rows == 0:
                continue
            if SALT_COL in rb.schema.names:
                rb = rb.select(names)
            pending.append(rb)
            pending_bytes += rb.get_total_buffer_size()
            if pending_bytes >= cfg.stripe_bytes:
                out = flush()
                if out is not None:
                    yield out
        out = flush()
        if out is not None:
            yield out

    return encode_stripes


SALT_SAMPLE_BYTES = 256 * 1024 * 1024
SALT_SAMPLE_FRACTION = 0.01


def _skew_detection_mode(df: DataFrame, cfg: EncodeConfig) -> str:
    """'exact' (full groupBy-count pre-pass) or 'sample' (1% sample —
    ~100x cheaper; a key at salt_threshold shows ~threshold*fraction
    sampled rows, flagged at half that to bias recall: over-salting
    splits a key into deterministic buckets anyway, under-salting is the
    only harmful direction). Auto switches on Catalyst's input-size
    estimate so small inputs keep the exact pass (SCALE.md: at 10^9 convs
    the exact pre-pass is ~30s per encode; the sample is seconds)."""
    if cfg.salt_detect != "auto":
        return cfg.salt_detect
    try:
        size = int(str(df._jdf.queryExecution().optimizedPlan()
                       .stats().sizeInBytes()))
    except Exception:
        return "exact"
    return "sample" if size > SALT_SAMPLE_BYTES else "exact"


def _skew_counts(df: DataFrame, cfg: EncodeConfig, mode: str) -> DataFrame:
    """Frame of keys exceeding salt_threshold under the chosen mode
    (separate from _with_salt so tests can plan-assert the Sample node)."""
    key = cfg.key_col
    if mode == "sample":
        frac = SALT_SAMPLE_FRACTION
        return (df.sample(fraction=frac, seed=7).groupBy(key).count()
                .filter(F.col("count") > cfg.salt_threshold * frac * 0.5))
    return df.groupBy(key).count().filter(F.col("count") > cfg.salt_threshold)


_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _with_salt(df: DataFrame, cfg: EncodeConfig) -> DataFrame:
    """Split mega-keys into deterministic buckets of bucket_rows using the
    (monotone-per-key) first order column.

    'static' mode (the 'auto' resolution for INTEGRAL order columns):
    salt = floor(order0 / bucket_rows) unconditionally — NO detection job.
    A per-key 0-based row index (turn_idx) yields salt 0 for every key
    smaller than bucket_rows and exactly the detection path's buckets for
    mega keys, so the encode loses its per-call skew pre-pass (an extra
    Spark job + collect: ~0.3 s fixed at bench scale, ~30 s EXACT-mode at
    10^9 keys per SCALE.md) while placements stay identical for row-index
    ordered data. Keys between bucket_rows and salt_threshold now split
    at bucket boundaries — same stripes (the writer cuts by bytes first),
    one extra partition spill per boundary. Non-integral order columns
    (ts) keep the sampled/exact detection: bucketing a timestamp only
    makes sense for keys already known to be mega, which is what the
    detection pass established."""
    key = cfg.key_col
    if not key or not cfg.order_cols:
        return df.withColumn(SALT_COL, F.lit(0))
    order0 = cfg.order_cols[0]
    mode = cfg.salt_detect
    if mode == "auto":
        if isinstance(df.schema[order0].dataType, _INTEGRAL_TYPES):
            mode = "static"
        else:
            mode = _skew_detection_mode(df, cfg)
    if mode == "static":
        return df.withColumn(
            SALT_COL,
            F.coalesce(
                F.floor(F.col(order0).cast("long")
                        / F.lit(cfg.bucket_rows)).cast("int"),
                F.lit(0)))
    counts = _skew_counts(df, cfg, mode)
    skewed = [r[0] for r in counts.select(key).collect()]  # mega-keys only: tiny
    if not skewed:
        return df.withColumn(SALT_COL, F.lit(0))
    return df.withColumn(
        SALT_COL,
        F.when(
            F.col(key).isin(skewed),
            F.floor(F.col(order0).cast("long") / F.lit(cfg.bucket_rows)).cast("int"),
        ).otherwise(F.lit(0)),
    )


def partition_count(df: DataFrame, cfg: EncodeConfig) -> int:
    if cfg.partitions:
        return cfg.partitions
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


def encode_df(df: DataFrame, cfg: EncodeConfig | None = None,
              pending_parts: list[int] | None = None) -> DataFrame:
    """Encode a DataFrame into a stripe table (one row per stripe)."""
    cfg = cfg or EncodeConfig()
    spec = spec_from_schema(df.schema)
    n = partition_count(df, cfg)
    key_type = df.schema[cfg.key_col].dataType if cfg.key_col else None
    if cfg.key_col:
        df = _with_salt(df, cfg)
        if pending_parts is not None:
            if cfg.range_partition:
                # hash-derived partition ids don't match repartitionByRange
                # placement — a resumed range run would filter wrong rows
                raise ValueError(
                    "pending_parts resume requires hash partitioning "
                    "(range_partition=False); range boundaries are not "
                    "reproducible from lineage alone")
            pid = F.pmod(F.hash(F.col(cfg.key_col), F.col(SALT_COL)), F.lit(n))
            df = df.filter(pid.isin(pending_parts))
        if cfg.range_partition:
            # disjoint key ranges per partition -> prune_stripes becomes
            # effective (each stripe's [key_min, key_max] is narrow); hash
            # partitioning (default) spreads skew better but every stripe
            # spans the key space
            df = df.repartitionByRange(n, F.col(cfg.key_col), F.col(SALT_COL))
        else:
            df = df.repartition(n, F.col(cfg.key_col), F.col(SALT_COL))
        # always sort when a key exists: stripe/row-group key ranges stay
        # narrow and decode + sort restores source order deterministically
        df = df.sortWithinPartitions(cfg.key_col, *cfg.order_cols)
    else:
        df = df.repartition(n)
    return df.mapInArrow(_make_encoder(spec, cfg), schema=stripe_schema(key_type))


# ----------------------------------------------------------------- decode --


def decode_df(stripes: DataFrame, spec: list[dict] | None = None,
              columns: list[str] | None = None,
              rg_predicate: dict | None = None) -> DataFrame:
    """Decode a stripe table back into rows (order: stripe order; sort by
    your key columns afterwards for the canonical view). Arrow-native: each
    stripe blob becomes one RecordBatch with no per-row Python.

    `spec=None` self-describes: the spec is recovered from the stripes'
    embedded meta (`spec_from_stripes`) — one extra driver-side read of a
    single meta JSON, the way an ORC reader parses the file footer first.
    Pass the spec explicitly in hot loops or when coercing schema drift.

    `columns` projects the decode: only those columns' streams are
    decompressed (the reference's BatchOption.Includes, column pruning at
    the storage layer — Catalyst prunes the relational side on top).

    `rg_predicate` (kwargs of arrow_stripe.select_row_groups) restricts the
    decode to row groups whose key/order ranges overlap the predicate — the
    reference's row-index seek/skip (/root/reference/orc/stripe.go:369-388)
    at row-group granularity: non-covering groups' streams are never
    decompressed."""
    if spec is None:
        spec = spec_from_stripes(stripes)
    if columns is not None:
        spec = [c for c in spec if c["name"] in columns]
    out_schema = schema_from_spec(spec)
    include = [c["name"] for c in spec] if columns is not None else None
    tz = stripes.sparkSession.conf.get("spark.sql.session.timeZone")

    def decode_stripes(batches):
        import pyarrow as pa

        from goorc_spark import arrow_stripe

        # the DECLARED spec wins over each stripe's embedded meta: stripes
        # written from a differently-typed source (pandas Int32 inferred as
        # LongType, schema evolution across runs) decode to their stored
        # width, but Spark's ArrowColumnVector row accessors require the
        # mapInArrow schema's exact type (a long vector under an int column
        # throws on getInt). Cast any mismatched column to the spec type —
        # a narrowing overflow is a real type error and should raise.
        want = {c["name"]: arrow_stripe.spec_arrow_type(c, tz) for c in spec}

        def coerce(batch):
            arrays, changed = [], False
            for f, arr in zip(batch.schema, batch.columns):
                w = want.get(f.name)
                if w is not None and arr.type != w:
                    arr = arr.cast(w)
                    changed = True
                arrays.append(arr)
            if not changed:
                return batch
            return pa.RecordBatch.from_arrays(
                arrays, schema=pa.schema(
                    [pa.field(f.name, a.type, f.nullable)
                     for f, a in zip(batch.schema, arrays)]))

        for rb in batches:
            metas = rb.column("meta").to_pylist()
            blobs = rb.column("blob")
            for i, meta_json in enumerate(metas):
                meta = json.loads(meta_json)
                rg_sel = None
                if rg_predicate:
                    rg_sel = arrow_stripe.select_row_groups(meta, **rg_predicate)
                    if not rg_sel and rg_sel is not None:
                        continue
                out = arrow_stripe.decode_stripe_batch(
                    blobs[i].as_py(), meta, tz=tz, include=include,
                    rg_sel=rg_sel)
                yield coerce(out)

    return stripes.select("meta", "blob").mapInArrow(decode_stripes,
                                                     schema=out_schema)


MAX_PUSHDOWN_IDS = 2048

# logical-plan node names that mean "reading storage, cheap to scan twice"
_SCAN_NODES = ("LogicalRelation", "DataSourceV2Relation",
               "DataSourceV2ScanRelation", "HiveTableRelation")


def _is_bare_scan(df: DataFrame) -> bool:
    """True when the frame is a storage scan (optionally under
    Project/Filter) — the only shape where a second pass costs one more
    scan instead of recomputing an upstream job."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan()
        while True:
            name = plan.getClass().getSimpleName()
            if name in _SCAN_NODES:
                return True
            if name in ("Project", "Filter") and plan.children().size() == 1:
                plan = plan.children().head()
                continue
            return False
    except Exception:
        return False


def read_rows(stripes: DataFrame, spec: list[dict], key_col: str,
              key_value, ord_col: str | None = None,
              ord_lo=None, ord_hi=None,
              columns: list[str] | None = None,
              id_pushdown: bool | None = None) -> DataFrame:
    """Point/range read: the reference's Seek(row)+Skip path
    (/root/reference/orc/reader.go:199-212, orc/stripe.go:369-388) expressed
    over the stripe table. Three pruning levels, each cutting work before
    the next: (1) stripe-level lineage range + bloom prune; (2) row-group
    index prune — only covering groups' streams are decompressed; (3) an
    exact Catalyst filter over the decoded rows.

    `id_pushdown` (default: auto — on only when `stripes` is a bare file
    scan): the range/bloom predicates are expressions parquet cannot push,
    so a single-pass plan still READS the blob column of pruned stripes
    before filtering them. Instead, a first pass scans lineage columns only
    (column pruning drops the blobs entirely — 8 KB of bloom vs 256 MB of
    blob per stripe at prod shape), collects the surviving stripe_ids
    (bounded: a point read matches a handful), and the second scan filters
    `stripe_id IN (...)` — a predicate parquet pushes into row-group stats
    and dictionary filters. Only worth it when re-scanning is cheap, i.e.
    the stripes ARE a storage scan — for derived/in-flight stripe frames
    the two passes would recompute the upstream job, so auto stays off.
    Falls back to the single-pass plan beyond MAX_PUSHDOWN_IDS matches."""
    pruned = prune_stripes(stripes, key_value=key_value)
    if id_pushdown is None:
        id_pushdown = _is_bare_scan(stripes)
    if id_pushdown:
        ids = [r[0] for r in pruned.select("stripe_id")
               .limit(MAX_PUSHDOWN_IDS + 1).collect()]
        if len(ids) <= MAX_PUSHDOWN_IDS:
            pruned = stripes.filter(F.col("stripe_id").isin(ids))
    pred: dict = {"key_value": key_value}
    if ord_lo is not None:
        pred["ord_lo"] = ord_lo
    if ord_hi is not None:
        pred["ord_hi"] = ord_hi
    out = decode_df(pruned, spec, columns=columns, rg_predicate=pred)
    cond = F.col(key_col) == F.lit(key_value)
    if ord_col is not None and ord_lo is not None:
        cond = cond & (F.col(ord_col) >= F.lit(ord_lo))
    if ord_col is not None and ord_hi is not None:
        cond = cond & (F.col(ord_col) <= F.lit(ord_hi))
    return out.filter(cond)


def read_rows_in(stripes: DataFrame, spec: list[dict], key_col: str,
                 key_values, columns: list[str] | None = None,
                 id_pushdown: bool | None = None) -> DataFrame:
    """Batch point read `key IN (...)` — the training-pipeline shape
    (fetch a batch of conversations by id) as ONE job instead of N point
    reads. Same three pruning levels as read_rows, each generalized to
    any-of-the-keys: (1) stripe lineage envelope range + per-key bloom OR
    (up to MAX_BLOOM_KEYS keys; beyond that the [min, max] envelope alone
    — still prunes sorted/range-partitioned layouts); (2) row-group index
    prune where ANY key fits the group's range (+ rg_bloom when
    recorded); (3) one exact Catalyst isin filter."""
    keys = sorted(set(key_values))
    if not keys:
        raise ValueError("key_values must be non-empty")
    pruned = prune_stripes(stripes, key_values=keys)
    if id_pushdown is None:
        id_pushdown = _is_bare_scan(stripes)
    if id_pushdown:
        ids = [r[0] for r in pruned.select("stripe_id")
               .limit(MAX_PUSHDOWN_IDS + 1).collect()]
        if len(ids) <= MAX_PUSHDOWN_IDS:
            pruned = stripes.filter(F.col("stripe_id").isin(ids))
    out = decode_df(pruned, spec, columns=columns,
                    rg_predicate={"key_values": keys})
    return out.filter(F.col(key_col).isin(keys))


def read_where(stripes: DataFrame, spec: list[dict], col: str | None = None,
               lo=None, hi=None,
               columns: list[str] | None = None,
               id_pushdown: bool | None = None,
               col_ranges: dict | None = None) -> DataFrame:
    """Value-predicate seek on ANY orderable column(s) (the reference's
    row-index statistics pruning, RowIndexEntry stats in
    pb/orc_proto.proto:92-99): row groups whose recorded [min, max] cannot
    intersect the predicate are never decompressed, then the exact filter
    runs over the survivors. `col`/`lo`/`hi` is the single-column form;
    `col_ranges` {column: (lo, hi)} adds further conjuncts — each prunes
    row groups independently (a group survives only if EVERY probed range
    can intersect), and each becomes an exact Catalyst filter.

    Unlike read_rows there is no stripe-level lineage range for arbitrary
    columns, so with `id_pushdown` (default: auto, bare file scans only) a
    first pass scans stripe_id+meta ONLY (no blob bytes), evaluates the
    row-group ranges there, and the second pass decodes `stripe_id IN
    (survivors)` — the IN predicate is parquet-pushable, so fully
    non-covering stripes' blobs are never read. At 10^12 rows pair this
    with range_partition on the hottest column."""
    ranges: dict = dict(col_ranges or {})
    if col is not None:
        ranges[col] = (lo, hi)
    if not ranges:
        raise ValueError("read_where needs `col` or `col_ranges`")
    if columns is not None:
        columns = list(columns) + [c for c in ranges if c not in columns]
    if id_pushdown is None:
        id_pushdown = _is_bare_scan(stripes)
    if id_pushdown:

        def probe(batches):
            import pyarrow as pa

            from goorc_spark import arrow_stripe

            for rb in batches:
                sids = rb.column("stripe_id").to_pylist()
                keep = []
                for i, meta_json in enumerate(rb.column("meta").to_pylist()):
                    sel = arrow_stripe.select_row_groups(
                        json.loads(meta_json), col_ranges=ranges)
                    if sel is None or sel:
                        keep.append(sids[i])
                yield pa.RecordBatch.from_pydict(
                    {"stripe_id": pa.array(keep, pa.string())})

        ids_df = stripes.select("stripe_id", "meta").mapInArrow(
            probe, "stripe_id string")
        ids = [r[0] for r in ids_df.limit(MAX_PUSHDOWN_IDS + 1).collect()]
        if len(ids) <= MAX_PUSHDOWN_IDS:
            stripes = stripes.filter(F.col("stripe_id").isin(ids))
    out = decode_df(stripes, spec, columns=columns,
                    rg_predicate={"col_ranges": ranges})
    cond = F.lit(True)
    for c, (clo, chi) in ranges.items():
        if clo is not None:
            cond = cond & (F.col(c) >= F.lit(clo))
        if chi is not None:
            cond = cond & (F.col(c) <= F.lit(chi))
    return out.filter(cond)


def read_rows_at(stripes: DataFrame, spec: list[dict] | None,
                 row_lo: int, row_hi: int,
                 columns: list[str] | None = None) -> DataFrame:
    """Absolute row-number seek — the reference's third public entry point,
    `Seek(rowNumber)` (/root/reference/orc/reader.go:199-212: cumulative
    stripe rows -> stride -> skip), over the stripe table: returns global
    rows [row_lo, row_hi) where global order is stripes ordered by
    (part_id, seq) with stored row order inside each stripe. Under a
    range-partitioned, order-sorted encode that equals ORDER BY
    (key, *order_cols) over the source.

    Plan: (1) a prefix-sum window over LINEAGE columns only — one row per
    stripe, blobs never read (at 10^12 turns / 256 MB stripes that is
    ~300k metadata rows through a single-partition window: bounded, and
    the blob column is pruned from the scan); (2) covering stripes join
    back by stripe_id (broadcast — a seek touches few stripes); (3) inside
    each stripe, row-group prefix sums pick covering groups, only their
    streams decompress, and the exact slice is cut from the decoded
    batch."""
    from pyspark.sql import Window

    if spec is None:
        spec = spec_from_stripes(stripes)
    if columns is not None:
        spec = [c for c in spec if c["name"] in columns]
    out_schema = schema_from_spec(spec)
    if row_hi <= row_lo:
        return decode_df(stripes.limit(0), spec, columns=columns)
    w = (Window.orderBy("part_id", "seq")
         .rowsBetween(Window.unboundedPreceding, -1))
    bounds = (stripes.select("stripe_id", "part_id", "seq", "n_rows")
              .withColumn("row_start",
                          F.coalesce(F.sum("n_rows").over(w), F.lit(0)))
              .filter((F.col("row_start") < row_hi)
                      & (F.col("row_start") + F.col("n_rows") > row_lo))
              .select("stripe_id", "row_start"))
    sel = stripes.join(F.broadcast(bounds), "stripe_id")
    include = [c["name"] for c in spec] if columns is not None else None
    tz = stripes.sparkSession.conf.get("spark.sql.session.timeZone")

    def decode_slices(batches):
        from goorc_spark import arrow_stripe

        for rb in batches:
            metas = rb.column("meta").to_pylist()
            blobs = rb.column("blob")
            starts = rb.column("row_start").to_pylist()
            ns = rb.column("n_rows").to_pylist()
            for i, meta_json in enumerate(metas):
                meta = json.loads(meta_json)
                slo = max(0, row_lo - starts[i])
                shi = min(ns[i], row_hi - starts[i])
                groups = meta.get("row_groups")
                rg_sel, first_off = None, 0
                if groups:
                    p, rg_sel = 0, []
                    for j, g in enumerate(groups):
                        if p < shi and p + g["n_rows"] > slo:
                            if not rg_sel:
                                first_off = p
                            rg_sel.append(j)
                        p += g["n_rows"]
                out = arrow_stripe.decode_stripe_batch(
                    blobs[i].as_py(), meta, tz=tz, include=include,
                    rg_sel=rg_sel)
                yield out.slice(slo - first_off, shi - slo)

    return (sel.select("meta", "blob", "row_start", "n_rows")
            .mapInArrow(decode_slices, schema=out_schema))


RUN_STATS_SCHEMA = ("column string, n_values bigint, null_count bigint, "
                    "min_long bigint, max_long bigint, sum_long bigint, "
                    "min_dbl double, max_dbl double, sum_dbl double, "
                    "min_str string, max_str string, "
                    "min_dec decimal(38,0), max_dec decimal(38,0), "
                    "bytes_sum bigint, has_str_bounds int, sum_overflow int")
_RUN_STATS_COLS = ["column", "n_values", "null_count", "min_long",
                   "max_long", "sum_long", "min_dbl", "max_dbl", "sum_dbl",
                   "min_str", "max_str", "min_dec", "max_dec", "bytes_sum",
                   "has_str_bounds", "sum_overflow"]


def run_stats(stripes: DataFrame) -> DataFrame:
    """Whole-run per-column statistics rolled up from each stripe's
    `col_stats` meta — the reference's file-footer aggregate statistics
    (/root/reference/orc/writer.go:140-177) over the stripe table. Pure
    metadata: only the `meta` JSON column is scanned, blobs are pruned.

    One row per column: n_values/null_count always; typed min/max/sum
    slots (longs for integer kinds — timestamps as epoch-micros, dates as
    days, decimals (precision<=18) as UNSCALED ints at the column scale;
    doubles for floats; strings for string/binary; sum_long for bool =
    true count; bytes_sum = total string/binary payload). String bounds
    are NULL unless EVERY stripe recorded one (long free text skips
    per-stripe bounds; see arrow_stripe.stripe_col_stats)."""

    def expand(batches):
        import pyarrow as pa

        names = _RUN_STATS_COLS
        for rb in batches:
            rows: dict = {k: [] for k in names}
            for meta_json in rb.column("meta").to_pylist():
                for name, st in (json.loads(meta_json).get("col_stats")
                                 or {}).items():
                    mn, mx, sm = st.get("min"), st.get("max"), st.get("sum")
                    is_int = isinstance(mn, int) and not isinstance(mn, bool)
                    rows["column"].append(name)
                    rows["n_values"].append(st["n"])
                    rows["null_count"].append(st["nulls"])
                    rows["min_long"].append(mn if is_int else None)
                    rows["max_long"].append(mx if is_int else None)
                    rows["sum_long"].append(sm if isinstance(sm, int) else None)
                    # explicit None marker = the stripe's exact sum overflowed
                    # int64 (arrow_stripe._exact_int_sum); the whole-run sum
                    # must then be omitted, not summed over the survivors
                    rows["sum_overflow"].append(
                        1 if ("sum" in st and sm is None) else 0)
                    rows["min_dbl"].append(mn if isinstance(mn, float) else None)
                    rows["max_dbl"].append(mx if isinstance(mx, float) else None)
                    rows["sum_dbl"].append(sm if isinstance(sm, float) else None)
                    rows["min_str"].append(mn if isinstance(mn, str) else None)
                    rows["max_str"].append(mx if isinstance(mx, str) else None)
                    rows["min_dec"].append(st.get("min_dec"))
                    rows["max_dec"].append(st.get("max_dec"))
                    rows["bytes_sum"].append(st.get("bytes"))
                    rows["has_str_bounds"].append(
                        0 if ("bytes" in st and mn is None and st["n"])
                        else 1)
            yield pa.RecordBatch.from_pydict(
                {"column": pa.array(rows["column"], pa.string()),
                 "n_values": pa.array(rows["n_values"], pa.int64()),
                 "null_count": pa.array(rows["null_count"], pa.int64()),
                 "min_long": pa.array(rows["min_long"], pa.int64()),
                 "max_long": pa.array(rows["max_long"], pa.int64()),
                 "sum_long": pa.array(rows["sum_long"], pa.int64()),
                 "min_dbl": pa.array(rows["min_dbl"], pa.float64()),
                 "max_dbl": pa.array(rows["max_dbl"], pa.float64()),
                 "sum_dbl": pa.array(rows["sum_dbl"], pa.float64()),
                 "min_str": pa.array(rows["min_str"], pa.string()),
                 "max_str": pa.array(rows["max_str"], pa.string()),
                 "min_dec": pa.array(rows["min_dec"], pa.decimal128(38, 0)),
                 "max_dec": pa.array(rows["max_dec"], pa.decimal128(38, 0)),
                 "bytes_sum": pa.array(rows["bytes_sum"], pa.int64()),
                 "has_str_bounds": pa.array(rows["has_str_bounds"],
                                            pa.int32()),
                 "sum_overflow": pa.array(rows["sum_overflow"], pa.int32())})

    long_rows = stripes.select("meta").mapInArrow(expand, RUN_STATS_SCHEMA)
    agg = long_rows.groupBy("column").agg(
        F.sum("n_values").alias("n_values"),
        F.sum("null_count").alias("null_count"),
        F.min("min_long").alias("min_long"),
        F.max("max_long").alias("max_long"),
        # rollup in decimal(38,0): the per-stripe sums are exact int64 but
        # their SUM can overflow int64 across stripes — Spark's long sum
        # wraps silently; the wide sum is checked back into range below
        # (reference semantics: omit the sum on overflow)
        F.sum(F.col("sum_long").cast("decimal(38,0)")).alias("_sum_dec"),
        F.max("sum_overflow").alias("_soflow"),
        F.min("min_dbl").alias("min_dbl"),
        F.max("max_dbl").alias("max_dbl"),
        F.sum("sum_dbl").alias("sum_dbl"),
        F.min("min_str").alias("_min_str"),
        F.max("max_str").alias("_max_str"),
        F.min("min_dec").alias("min_dec"),
        F.max("max_dec").alias("max_dec"),
        F.sum("bytes_sum").alias("bytes_sum"),
        F.min("has_str_bounds").alias("_complete"))
    i64 = (F.col("_sum_dec") >= F.lit(-(1 << 63)).cast("decimal(38,0)")) & \
          (F.col("_sum_dec") <= F.lit((1 << 63) - 1).cast("decimal(38,0)"))
    return agg.select(
        "column", "n_values", "null_count", "min_long", "max_long",
        F.when((F.col("_soflow") == 0) & i64,
               F.col("_sum_dec").cast("long")).alias("sum_long"),
        "min_dbl", "max_dbl", "sum_dbl",
        F.when(F.col("_complete") == 1, F.col("_min_str")).alias("min_str"),
        F.when(F.col("_complete") == 1, F.col("_max_str")).alias("max_str"),
        "min_dec", "max_dec", "bytes_sum")


# ---------------------------------------------------------------- lineage --


MAX_BLOOM_KEYS = 64  # per-key OR bloom predicates above this would bloat
#                        the Catalyst expression; fall back to the keys'
#                        [min, max] envelope range (still prunes sorted /
#                        range-partitioned layouts)


def prune_stripes(stripes: DataFrame, key_value=None,
                  lo=None, hi=None, key_values=None) -> DataFrame:
    """Stripe-level predicate pushdown using the lineage [key_min, key_max]
    range — the analog of the reference's row-index stats-based seek/skip
    (/root/reference/orc/stripe.go:369-388): stripes whose key range cannot
    contain the predicate are filtered out BEFORE their blobs are read, so
    the parquet scan of the stripe table prunes them too (blob column never
    materialized for skipped stripes)."""
    if key_value is not None:
        lo = hi = key_value
    if key_values is not None:
        key_values = sorted(set(key_values))
        lo, hi = key_values[0], key_values[-1]
    cond = F.lit(True)
    # NULL bounds (keyless encode, all-null key stripe) mean UNKNOWN, not
    # out-of-range: keep the stripe — a wasted read, never a wrong skip
    if hi is not None:
        cond = cond & (F.col("key_min").isNull()
                       | (F.col("key_min") <= F.lit(hi)))
    if lo is not None:
        cond = cond & (F.col("key_max").isNull()
                       | (F.col("key_max") >= F.lit(lo)))
    probes = [key_value] if key_value is not None else (
        key_values if key_values is not None
        and len(key_values) <= MAX_BLOOM_KEYS else [])
    if probes and "key_bloom" in stripes.columns:
        # bloom probe with built-ins only: the k probe positions are a
        # driver-side constant for the literal key, so each test is one
        # substring/hex/conv/bitwiseAND over the 8 KB filter — the whole
        # predicate pushes into the stripe-table scan. Under hash
        # partitioning this is what skips stripes (every stripe's
        # [key_min, key_max] range spans the key space there). NULL bloom
        # (legacy stripes, keyless encodes) never skips.
        any_probe = F.lit(False)
        for kv in probes:
            probe = F.lit(True)
            for p in bloom_positions(kv):
                byte = F.conv(
                    F.hex(F.substring(F.col("key_bloom"), p // 8 + 1, 1)),
                    16, 10).cast("int")
                probe = probe & (byte.bitwiseAND(F.lit(1 << (p & 7))) != 0)
            any_probe = any_probe | probe
        cond = cond & (F.col("key_bloom").isNull() | any_probe)
    return stripes.filter(cond)


def lineage_view(stripes: DataFrame) -> DataFrame:
    """Per-stripe lineage/metrics (everything except the blob) — the analog
    of the reference's file footer + row index, kept as a queryable table."""
    return stripes.select(
        "stripe_id", "run_id", "part_id", "seq", "n_rows", "raw_bytes",
        "enc_bytes", "key_min", "key_max", "encode_ms",
        (F.col("raw_bytes") / F.col("enc_bytes")).alias("compression_ratio"),
    )


def compact_stripes(stripes: DataFrame, spec: list[dict],
                    cfg: EncodeConfig,
                    min_bytes: int | None = None) -> DataFrame:
    """Merge undersized stripes into full ones — the maintenance pass a
    streaming ingest needs (each micro-batch flushes whatever it holds, so
    a 10-second trigger writes stripes far below stripe_bytes; per-stripe
    overheads — footer, dictionaries, bloom, row groups — then dominate and
    point reads touch many blobs).

    Stripes at or above `min_bytes` (default stripe_bytes/2 of RAW size)
    pass through untouched — no decode cost for data that is already
    well-shaped; the rest are decoded and re-encoded under `cfg`, which
    re-clusters them by key and rebuilds lineage/bloom under cfg.run_id.
    The result is a valid stripe table: decode_df(compact(s)) is row-equal
    to decode_df(s) (pytest + the compact_roundtrip gate query pin this).

    At 10^12-turn scale this is an incremental job: filter small stripes by
    lineage (a parquet metadata scan — blobs of passing stripes are never
    read), compact, atomically swap the affected partitions."""
    if min_bytes is None:
        min_bytes = cfg.stripe_bytes // 2
    small = stripes.filter(F.col("raw_bytes") < min_bytes)
    big = stripes.filter(F.col("raw_bytes") >= min_bytes)
    recoded = encode_df(decode_df(small, spec), cfg)
    return big.select(*recoded.columns).union(recoded)


_TABLE_IDENT = re.compile(r"^[A-Za-z_]\w*(\.[A-Za-z_]\w*){1,2}$")


def _is_table_target(target: str) -> bool:
    """Catalog table identifier vs filesystem path. Tables must be
    explicit: a dotted identifier (`db.tbl`, `catalog.db.tbl`) or a
    `table:` prefix. A bare relative name ('stripes_out') is a path —
    earlier versions classified it as a table and silently created a
    managed table when the caller meant a relative directory."""
    return target.startswith("table:") or bool(_TABLE_IDENT.match(target))


def _table_name(target: str) -> str:
    return target[6:] if target.startswith("table:") else target


def write_encoded(stripes: DataFrame, target: str,
                  mode: str = "append") -> None:
    """Write the stripe table to a parquet directory or a catalog TABLE.

    Catalog targets use the DataSourceV2 `writeTo` API — the exact call an
    Iceberg sink takes (`spark.sql.catalog.<name>` configured and
    iceberg-spark-runtime on the classpath make the identifier an Iceberg
    table with snapshot-isolated commits, which is what the resume path
    wants at 10^12-turn scale: a killed run's partial append never becomes
    visible). This container has no Iceberg jar, so tests exercise the same
    code path through the V2 session catalog backed by parquet."""
    from pyspark.errors import AnalysisException

    if not _is_table_target(target):
        stripes.write.mode(mode).parquet(target)
        return
    target = _table_name(target)
    spark = stripes.sparkSession
    exists = spark.catalog.tableExists(target)
    if mode == "error" and exists:
        raise ValueError(f"table {target} already exists (mode='error')")
    try:
        if mode == "overwrite" and exists:
            stripes.writeTo(target).using("parquet").createOrReplace()
        elif exists:
            stripes.writeTo(target).append()
        else:
            stripes.writeTo(target).using("parquet").create()
    except AnalysisException:
        # the V2 session catalog registers parquet tables as v1, which
        # rejects writeTo append/replace; Iceberg (a true v2 catalog)
        # takes the branch above
        stripes.write.mode("append" if mode == "append" else "overwrite") \
            .saveAsTable(target)


def read_encoded(spark: SparkSession, target: str) -> DataFrame:
    """Load a stripe table written by `write_encoded` (path or catalog
    table)."""
    return (spark.read.table(_table_name(target)) if _is_table_target(target)
            else spark.read.parquet(target))


def resume_encode(spark: SparkSession, df: DataFrame, target: str,
                  cfg: EncodeConfig) -> DataFrame:
    """Encode only partitions not yet present at `target` (exact resume
    after a failed/killed run), append them, and return the full stripe
    table. `target` may be a parquet directory or a catalog table."""
    n = partition_count(df, cfg)
    try:
        existing = read_encoded(spark, target)
        done = [r[0] for r in existing.select("part_id").distinct().collect()]
    except Exception:
        existing, done = None, []
    pending = [p for p in range(n) if p not in done]
    if pending:
        stripes = encode_df(df, cfg, pending_parts=pending)
        write_encoded(stripes, target, mode="append")
    return read_encoded(spark, target)

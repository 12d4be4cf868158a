"""Deduplication operators for the documents table.

Scale notes (100 TB): exact dedup is one hash-shuffle on a digest (never on
the full text — shuffle bytes stay tiny); MinHash-LSH banding turns the
quadratic candidate problem into an equi-join on band keys; the shingle
explode uses distinct-per-doc shingles to bound fan-out; all joins are
key-equi joins that AQE can re-plan for skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per exact text; group on the md5 digest so the
    shuffle carries 16 bytes per row, not the document."""
    return (
        docs.select("doc_id", F.md5(F.encode("text", "utf-8")).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


def _shingles(col, n: int):
    npos = F.greatest(F.length(col) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), npos), lambda i: col.substr(i, F.lit(n)))
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (the verification stage after LSH
    candidate generation; on its own it is quadratic in shared shingles)."""
    sh = docs.select(
        "doc_id", F.explode(_shingles(F.col("text"), n)).alias("shingle"),
        F.size(_shingles(F.col("text"), n)).alias("n_sh"),
    )
    # spread the quadratic join work: the small side broadcasts anyway, but
    # the probe side must not collapse to one input split (common shingles
    # make the joined stream ~|docs|^2 rows — CPU-bound, embarrassingly
    # parallel in doc_id)
    par = docs.sparkSession.sparkContext.defaultParallelism
    a = sh.repartition(par, "doc_id").alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                 F.col("a.n_sh").alias("na"), F.col("b.n_sh").alias("nb"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, k: int = 12, shingle: int = 6) -> DataFrame:
    """k-permutation MinHash via seeded md5 — md5(seed || shingle) is a
    deterministic 'permutation' reproducible in any SQL engine."""
    # one pass over exploded distinct shingles: k seeded hashes per shingle
    # occurrence, min-aggregated per doc with map-side combine. (The naive
    # form — k array_min(transform(shingles)) projections — makes Catalyst
    # inline the shingle build k times; this shape computes shingles once
    # and shuffles only k x 16-byte partial minima per doc.)
    sh = docs.select(
        "doc_id", F.explode(_shingles(F.col("text"), shingle)).alias("s"))
    aggs = [
        F.min(F.md5(F.encode(F.concat(F.lit(f"{j}:"), F.col("s")), "utf-8")))
        .alias(f"h{j}")
        for j in range(k)
    ]
    sigs = sh.groupBy("doc_id").agg(*aggs)
    return sigs.select(
        "doc_id", F.array(*[F.col(f"h{j}") for j in range(k)]).alias("minhash"))


def minhash_lsh_pairs(docs: DataFrame, k: int = 12, bands: int = 4,
                      shingle: int = 6) -> DataFrame:
    """LSH banding: same (band_id, band_hash) => candidate pair. One explode
    of `bands` rows per doc, then an equi-join on the band key — the
    scale-out path for near-dup at 10^9+ docs."""
    rows = k // bands
    sigs = minhash_signatures(docs, k=k, shingle=shingle)
    banded = sigs.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.encode(F.concat_ws("|", *[
                    F.col("minhash")[b * rows + r] for r in range(rows)
                ]), "utf-8")).alias("bh"),
            )
            for b in range(bands)
        ])).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bh")
    # group each band-bucket and expand sorted doc-id combinations JVM-side:
    # one pass over signatures (a self-join would recompute them for both
    # sides) and one shuffle keyed by (band, bh)
    buckets = banded.groupBy("band", "bh") \
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds")) \
        .filter(F.size("ds") > 1)
    ds = F.col("ds")
    pair_structs = F.flatten(F.transform(
        ds,
        lambda x, i: F.transform(
            F.slice(ds, i + F.lit(2), F.greatest(F.size(ds) - i - 1, F.lit(0))),
            lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")))))
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over whitespace tokens, entirely with built-ins:
    explode tokens -> xxhash64 -> 64 bit-vote sums per doc -> reassembled
    signature. One shuffle keyed by doc_id; whole-stage codegen end to end
    (an earlier variant looped per doc inside a pandas UDF)."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = F.xxhash64("tok")
    votes = toks.groupBy("doc_id").agg(*[
        F.sum(F.when(h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), j)) != 0, 1)
               .otherwise(-1)).alias(f"b{j}")
        for j in range(64)
    ])
    sig = None
    for j in range(64):
        one = (F.lit(-(2 ** 63)).cast("long") if j == 63
               else F.shiftleft(F.lit(1).cast("long"), j))
        term = F.when(F.col(f"b{j}") > 0, one).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else (sig + term)
    hashed = votes.select("doc_id", sig.alias("simhash64"))
    # docs with no tokens keep a deterministic 0 signature
    return docs.select("doc_id").join(hashed, "doc_id", "left") \
        .select("doc_id", F.coalesce("simhash64", F.lit(0).cast("long"))
                .alias("simhash64"))


def simhash_near_dup(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """SimHash near-duplicate pairs: band the 64-bit signature into 4x16-bit
    keys (a pair within Hamming distance 3 must agree on at least one band
    by pigeonhole), bucket-join candidates, verify with bit_count(xor).
    Pure built-ins; the shuffle carries (band, key) buckets only."""
    sh = simhash(docs)
    banded = sh.select(
        "doc_id", "simhash64",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("simhash64"), 16 * b)
                 .bitwiseAND(F.lit(0xFFFF).cast("long")).alias("bk"),
            )
            for b in range(4)
        ])).alias("x"),
    ).select("doc_id", "simhash64", "x.band", "x.bk")
    buckets = banded.groupBy("band", "bk").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "simhash64")))
         .alias("ds")).filter(F.size("ds") > 1)
    ds = F.col("ds")
    pair_structs = F.flatten(F.transform(
        ds,
        lambda x, i: F.transform(
            F.slice(ds, i + F.lit(2), F.greatest(F.size(ds) - i - 1, F.lit(0))),
            lambda y: F.struct(x["doc_id"].alias("doc_a"),
                               y["doc_id"].alias("doc_b"),
                               F.bit_count(x["simhash64"].bitwiseXOR(
                                   y["simhash64"])).alias("hamming")))))
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.hamming")
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_near_dup(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Brute force O(n^2) — correct
    baseline; the LSH-bucketed variant in similarity.py is the scale path."""
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    norm = lambda x: F.sqrt(dot(x, x))  # noqa: E731
    e = embeddings.select("vec_id", "embedding",
                          norm(F.col("embedding")).alias("nrm"))
    a, b = e.alias("a"), e.alias("b")
    cos = dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"),
                F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )

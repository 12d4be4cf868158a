"""Deterministic sampling/split guarantees: assignment is a pure function
of (salt, key) — stable when the corpus grows, reproducible across runs,
and independent between salts."""

from pyspark.sql import functions as F

from goorc_spark.pipeline_ops import sampling


def _docs(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"),
                                 F.concat(F.lit("t"), F.col("id"))
                                  .alias("text"))


def test_split_total_and_stability(spark):
    small = sampling.hash_split(_docs(spark, 400))
    big = sampling.hash_split(_docs(spark, 1000))
    assert small.count() == 400
    assert small.select("split").distinct().count() == 3
    # growing the corpus never reassigns an existing document
    moved = (small.alias("a").join(big.alias("b"), "doc_id")
             .filter(F.col("a.split") != F.col("b.split")).count())
    assert moved == 0
    # weights are approximately honored
    frac = {r["split"]: r["count"] / 1000
            for r in big.groupBy("split").count().collect()}
    assert 0.85 < frac["train"] < 0.95
    assert 0.02 < frac["val"] < 0.09 and 0.02 < frac["test"] < 0.09


def test_sample_reproducible_and_nested(spark):
    docs = _docs(spark, 1000)
    a = {r[0] for r in sampling.deterministic_sample(docs, 0.3)
         .select("doc_id").collect()}
    b = {r[0] for r in sampling.deterministic_sample(docs, 0.3)
         .select("doc_id").collect()}
    assert a == b and 200 < len(a) < 400
    # a smaller fraction with the same salt is a SUBSET (nested samples:
    # shrinking the sample never swaps documents in)
    c = {r[0] for r in sampling.deterministic_sample(docs, 0.1)
         .select("doc_id").collect()}
    assert c <= a
    # a different salt decorrelates from the split assignment
    split_train = {r[0] for r in sampling.hash_split(docs)
                   .filter("split = 'train'").collect()}
    assert a - split_train  # the sample is not just the head of train
    # narrow op: no shuffle anywhere in the sampling plan
    plan = sampling.deterministic_sample(docs, 0.3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_budget(spark):
    docs = _docs(spark, 500).withColumn(
        "text", F.concat(F.lit("w "), F.repeat(F.lit("tok "),
                                               (F.col("doc_id") % 40).cast("int"))))
    packs = sampling.pack_sequences(docs, budget_tokens=100, buckets=4)
    assert packs.count() == 500
    # a pack's preceding-total start positions all lie inside one budget
    # window; total tokens per pack stay under budget + one max doc
    agg = (packs.groupBy("bucket", "pack_id")
           .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
           .collect())
    assert all(r["tot"] <= 100 + r["mx"] for r in agg)
    # deterministic: same input, same packing
    again = sampling.pack_sequences(docs, budget_tokens=100, buckets=4)
    assert packs.exceptAll(again).count() == 0


def test_stratified_rates(spark):
    docs = _docs(spark, 3000).withColumn(
        "lang", F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                             (F.col("doc_id") % 3 + 1).cast("int")))
    out = sampling.stratified_sample(docs, "lang", {"en": 0.6, "de": 0.2},
                                     default_fraction=0.0)
    rates = {r["lang"]: r["count"] / 1000
             for r in out.groupBy("lang").count().collect()}
    assert 0.5 < rates["en"] < 0.7
    assert 0.12 < rates["de"] < 0.28
    assert "fr" not in rates  # default 0.0 drops the unlisted stratum

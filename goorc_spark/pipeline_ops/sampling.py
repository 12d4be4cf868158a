"""Deterministic sampling / dataset splitting for training-data pipelines.

Every op keys on a stable hash of the document id — NOT on `rand()` — so
results are reproducible across runs, clusters, and engines (the md5-derived
uniform is recomputable in ANSI SQL, which puts these ops behind the DuckDB
oracle gate), and a document's split assignment never changes when the
corpus grows — the property training pipelines need so yesterday's val set
stays today's val set.

Scale: each op is a narrow map + filter (no shuffle, no sampling pass, no
count); Catalyst pushes the filter to the scan where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# md5 top-32-bits as a uniform in [0, 1): enough resolution for split
# fractions (2^-32 granularity) and cheap to reproduce in any SQL engine
_DENOM = float(1 << 32)


def _unit_hash(col, salt: str):
    """Deterministic uniform [0,1) from (salt, value) — md5 top 8 hex chars
    / 2^32. The salt decorrelates independent uses (sampling vs splitting
    the same corpus must not reuse one hash, or the 10% sample would be
    exactly the head of the train split)."""
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(_DENOM)


def hash_split(docs: DataFrame, weights: dict[str, float] | None = None,
               key: str = "doc_id", salt: str = "split") -> DataFrame:
    """Assign every row to a named split with the given weights
    (default 90/5/5 train/val/test). Cumulative-threshold CASE over the
    unit hash: assignment is a pure function of (salt, key) — stable under
    corpus growth, repartitioning, and engine choice."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    u = _unit_hash(F.col(key), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        expr = (F.when(u < acc, name) if expr is None
                else expr.when(u < acc, name))
    expr = (expr.otherwise(names[-1]) if expr is not None
            else F.lit(names[-1]))
    return docs.select(key, expr.alias("split"))


def deterministic_sample(docs: DataFrame, fraction: float,
                         key: str = "doc_id",
                         salt: str = "sample") -> DataFrame:
    """Keep a deterministic `fraction` of rows: unit hash < fraction.
    Unlike df.sample(), re-running (or re-reading after executor loss)
    yields the SAME rows, and two engines agree row-for-row."""
    u = _unit_hash(F.col(key), salt)
    return docs.filter(u < F.lit(float(fraction)))


def pack_sequences(docs: DataFrame, budget_tokens: int = 2048,
                   buckets: int = 64, key: str = "doc_id",
                   salt: str = "pack") -> DataFrame:
    """Greedy sequence packing: assign each document to a pack whose
    cumulative whitespace-token count stays near `budget_tokens` — the
    training-batch assembly step. Deterministic and distributed: a hash
    bucket spreads the corpus over `buckets` independent streams (the
    window sort is per-bucket, never a global sort), the within-bucket
    order is (doc_id), and a document joins the pack its RUNNING total
    starts in (floor(preceding_tokens / budget)). Documents longer than
    the budget own their packs. Approximate by design (no cross-bucket
    rebalancing) — the standard scalable packing scheme; exactness claim =
    same algebra as the SQL oracle."""
    from pyspark.sql import Window

    t = F.trim(F.col("text"))
    n_tok = F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))
    b = (F.conv(F.substring(
        F.md5(F.concat(F.lit(salt), F.lit("|"), F.col(key).cast("string"))),
        1, 8), 16, 10).cast("long") % buckets).alias("bucket")
    w = (Window.partitionBy("bucket").orderBy(key)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    staged = docs.select(key, b, n_tok.alias("n_tokens"))
    cum = F.sum("n_tokens").over(w)
    return staged.select(
        key, "bucket", "n_tokens",
        F.floor((cum - F.col("n_tokens")) / budget_tokens)
         .cast("long").alias("pack_id"))


def stratified_sample(docs: DataFrame, strata_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0,
                      key: str = "doc_id",
                      salt: str = "strata") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample by language or
    quality bucket — the standard data-mixing move). `fractions` maps a
    stratum value to its keep-rate; unlisted strata keep
    `default_fraction`. Still one narrow pass: the per-row threshold is a
    CASE on the stratum column, the keep decision a hash compare."""
    u = _unit_hash(F.col(key), salt)
    thresh = None
    for val, frac in fractions.items():
        thresh = (F.when(F.col(strata_col) == val, float(frac)) if thresh is None
                  else thresh.when(F.col(strata_col) == val, float(frac)))
    thresh = (thresh.otherwise(float(default_fraction)) if thresh is not None
              else F.lit(float(default_fraction)))
    return docs.filter(u < thresh)

"""Text analysis operators over the documents table.

Every op is expressed with built-in pyspark.sql.functions only (whole-stage
codegen, no Python in the hot path) and has an exact DuckDB SQL twin in
__spark_entry__.oracle_sql for the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# deterministic marker-substring language heuristic (n-gram-style):
# counts of common function-word patterns per language.
_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
    "es": [" el ", " los ", " y "],
}

_PUNCT = r"[.,!?;:]"
_STOPWORDS = ["the", "a", "of", "to", "in"]


def _count_occurrences(col, needle: str):
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace token count + char stats per document."""
    t = F.trim(F.col("text"))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+"))).alias("n_tokens"),
        F.size(F.array_distinct(F.split(t, r"\s+"))).alias("n_distinct_tokens"),
    )


BPE_ISH = r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]"


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """BPE-style pre-tokenization count: letter runs, digit runs, and single
    punctuation marks (the GPT-2-ish split), plus a chars-per-token signal.
    Pure regexp_extract_all — JVM-side, and reproducible in RE2 engines."""
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH), 0)
    n = F.size(toks)
    return docs.select(
        "doc_id",
        n.alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_bpe_tokens"),
        F.round(F.length("text") / F.greatest(n, F.lit(1)), 6)
         .alias("chars_per_token"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword quality signals, fully JVM-side."""
    text = F.col("text")
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, _PUNCT, ""))
    stop_hits = None
    for w in _STOPWORDS:
        c = _count_occurrences(F.concat(F.lit(" "), text, F.lit(" ")), f" {w} ")
        stop_hits = c if stop_hits is None else (stop_hits + c)
    tokens = F.when(F.trim(text) == "", 0).otherwise(F.size(F.split(F.trim(text), r"\s+")))
    return docs.select(
        "doc_id",
        n.alias("n_chars"),
        tokens.alias("n_tokens"),
        F.round(punct / F.greatest(n, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(tokens, F.lit(1)), 6).alias("stopword_ratio"),
        (
            (n >= 50) & (n <= 10000) & (stop_hits / F.greatest(tokens, F.lit(1)) > 0.01)
        ).alias("quality_pass"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-n-gram language scoring with a deterministic priority
    tie-break (en > de > fr > es > unknown)."""
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    scores = {
        lang: sum(_count_occurrences(padded, m) for m in markers)
        for lang, markers in _LANG_MARKERS.items()
    }
    pred = (
        F.when((scores["en"] >= scores["de"]) & (scores["en"] >= scores["fr"])
               & (scores["en"] >= scores["es"]) & (scores["en"] > 0), "en")
        .when((scores["de"] >= scores["fr"]) & (scores["de"] >= scores["es"])
              & (scores["de"] > 0), "de")
        .when((scores["fr"] >= scores["es"]) & (scores["fr"] > 0), "fr")
        .when(scores["es"] > 0, "es")
        .otherwise("unknown")
    )
    return docs.select("doc_id", pred.alias("lang_pred"),
                       scores["en"].alias("score_en"))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals (public heuristics from the Gopher /
    RefinedWeb data-quality literature): the fraction of duplicate LINES
    and the fraction of tokens inside duplicated 2-grams. High values mark
    boilerplate/spam for downstream filtering. Pure built-ins: split +
    array algebra, no shuffle, no UDF."""
    lines = F.filter(F.split(F.col("text"), r"\n"),
                     lambda x: F.trim(x) != "")
    n_lines = F.size(lines)
    dup_lines = n_lines - F.size(F.array_distinct(lines))
    t = F.trim(F.col("text"))
    toks = F.when(t == "", F.array().cast("array<string>")) \
        .otherwise(F.split(t, r"\s+"))
    n_tok = F.size(toks)
    # explicit index transform (zip_with pads to the longer side with nulls,
    # and sequence(1, 0) would generate a DESCENDING range — both traps)
    grams = F.when(n_tok >= 2, F.transform(
        F.sequence(F.lit(1), n_tok - 1),
        lambda i: F.concat(F.element_at(toks, i), F.lit(" "),
                           F.element_at(toks, i + 1)))) \
        .otherwise(F.array().cast("array<string>"))
    n_g = F.size(grams)
    dup_grams = n_g - F.size(F.array_distinct(grams))
    return docs.select(
        "doc_id",
        n_lines.alias("n_lines"),
        F.round(dup_lines / F.greatest(n_lines, F.lit(1)), 6)
         .alias("dup_line_frac"),
        F.round(dup_grams / F.greatest(n_g, F.lit(1)), 6)
         .alias("dup_2gram_frac"),
    )


# public-pattern scrubbing expressions (the usual curation regexes)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"(\+\d{1,2}[ .-]?)?(\(\d{3}\)|\d{3})[ .-]?\d{3}[ .-]?\d{4}"


def redact_pii(docs: DataFrame) -> DataFrame:
    """Replace email addresses and phone-number shapes with typed tags —
    the standard pre-training scrub. Two chained JVM regexp_replace passes
    (codegen, no UDF); returns (doc_id, clean text, per-kind hit counts)."""
    text = F.col("text")
    emails = F.size(F.regexp_extract_all(text, F.lit(_PII_EMAIL), 0))
    no_email = F.regexp_replace(text, _PII_EMAIL, "<EMAIL>")
    phones = F.size(F.regexp_extract_all(no_email, F.lit(_PII_PHONE), 0))
    clean = F.regexp_replace(no_email, _PII_PHONE, "<PHONE>")
    return docs.select(
        "doc_id", clean.alias("text"),
        emails.alias("n_emails"), phones.alias("n_phones"))


def fingerprint(docs: DataFrame, shingle: int = 8) -> DataFrame:
    """Document fingerprints: whole-text md5 plus a min-shingle-hash (the
    1-permutation minhash); both exactly reproducible in ANSI SQL."""
    text = F.col("text")
    npos = F.greatest(F.length(text) - F.lit(shingle - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(1), npos),
        lambda i: F.md5(F.encode(text.substr(i, F.lit(shingle)), "utf-8")),
    )
    return docs.select(
        "doc_id",
        F.md5(F.encode(text, "utf-8")).alias("md5"),
        F.array_min(shingles).alias("min_shingle_hash"),
    )

"""Planted-example checks for the curation-filter text ops (the gate
already pins them against DuckDB on the driver corpus; these pin the
SEMANTICS on known inputs)."""

from goorc_spark.pipeline_ops import text


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string")


def test_repetition_stats_planted(spark):
    rows = [
        "a b c d e f g h",                       # no repetition
        "spam line\nspam line\nspam line\nreal", # 2 of 4 lines duplicated
        "buy now buy now buy now",               # repeated 2-grams
        "",
    ]
    out = {r["doc_id"]: r for r in
           text.repetition_stats(_docs(spark, rows)).collect()}
    assert out[0]["dup_line_frac"] == 0.0
    assert out[0]["dup_2gram_frac"] == 0.0
    assert out[1]["n_lines"] == 4
    assert out[1]["dup_line_frac"] == 0.5
    # "buy now buy now buy now": grams = [buy now, now buy, buy now,
    # now buy, buy now] -> 3 duplicates of 5
    assert out[2]["dup_2gram_frac"] == 0.6
    assert out[3]["n_lines"] == 0 and out[3]["dup_line_frac"] == 0.0


def test_redact_pii_planted(spark):
    rows = [
        "contact me at jane.doe+spam@example.co.uk or call +1 (555) 123-4567",
        "no pii here at all",
        "two mails: a@b.io c@d.org and 555-123-4567",
    ]
    out = {r["doc_id"]: r for r in
           text.redact_pii(_docs(spark, rows)).collect()}
    assert "<EMAIL>" in out[0]["text"] and "<PHONE>" in out[0]["text"]
    assert "jane" not in out[0]["text"] and "4567" not in out[0]["text"]
    assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1
    assert out[1]["text"] == "no pii here at all"
    assert out[1]["n_emails"] == 0 and out[1]["n_phones"] == 0
    assert out[2]["n_emails"] == 2 and out[2]["n_phones"] == 1

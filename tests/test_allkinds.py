"""allkinds gate query: every column kind through encode->decode with the
stable comparison projection (the pytest twin of the driver's oracle row;
reference e2e coverage: /root/reference/orc/file_test.go:23-82)."""

from __future__ import annotations

from goorc_spark import allkinds, engine


def test_allkinds_roundtrip_matches_source(spark):
    wide = allkinds.allkinds_from_events(spark, "/root/testdata/sf0.001")
    want = sorted(map(str, allkinds.comparison_view(wide).collect()))
    got = sorted(map(str,
                     allkinds.allkinds_roundtrip(
                         spark, "/root/testdata/sf0.001").collect()))
    assert got == want


def test_allkinds_covers_every_scalar_kind(spark):
    wide = allkinds.allkinds_from_events(spark, "/root/testdata/sf0.001")
    kinds = {c["kind"] for c in engine.spec_from_schema(wide.schema)}
    kinds.discard("timestamp_ntz")  # parquet ts may load as NTZ — same codec
    kinds.add("timestamp")
    assert {"byte", "short", "int", "long", "bool", "float", "double",
            "decimal", "date", "timestamp", "string", "binary", "list",
            "map", "struct"} <= kinds

"""goorc_spark — a PySpark-native per-column lightweight-compression engine.

Re-expresses the encoding repertoire of the reference Go ORC library
(PatrickHuang888/goorc) as vectorized numpy kernels driven from Spark
``mapInArrow`` stages (zero-copy Arrow buffer extraction), with a per-stripe
codec auto-selector the reference lacks. Nothing here is a translation of the reference's Go code: the wire
formats are implemented from the public ORC v1 specification, pinned by the
reference's published unit-test vectors (ported as pytest fixtures in
``tests/``).

Layout
------
``goorc_spark.codecs``      pure-numpy codec kernels (RLEv2, byte/bool RLE,
                            varint/zigzag, bitpack, dictionary, FSST, floats,
                            timestamps, zstd/zlib/lz4 chunk container)
``goorc_spark.stats``       per-chunk column statistics (feed the selector)
``goorc_spark.selector``    codec auto-selection rules
``goorc_spark.arrow_stripe`` Arrow-native stripe assembly (the engine's hot
                            path; wire format pinned by golden fixtures in
                            ``tests/fixtures/``), incl. nested
                            struct/list/map columns
``goorc_spark.orc_native``  native ORC byte-format reader (real .orc files
                            decoded by the repo's own codecs, no JVM)
``goorc_spark.engine``      Spark pipeline: partitioning, salting, encode,
                            decode, projection, pruning, lineage/resume
``goorc_spark.streaming``   Structured Streaming incremental encode,
                            stateful conversation stats, watermarked
                            windowed ingest rollup
``goorc_spark.orc_bridge``  real-ORC file interop (ingest/export)
``goorc_spark.transcripts`` deterministic transcripts table (synthetic +
                            derived-from-events with a DuckDB oracle twin)
``goorc_spark.pipeline_ops`` training-data ops: dedup + decontamination,
                            similarity search, text analysis, deterministic
                            splits/sampling/packing, multimodal stubs
"""

__version__ = "0.1.0"

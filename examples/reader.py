#!/usr/bin/env python
"""Read example — the analog of the reference's examples/reader.go
(/root/reference/examples/reader.go: open the file, read the schema from
the footer, iterate batches). The stripe table is self-describing: the
schema comes out of the embedded stripe meta (`spec_from_stripes`), so
`decode_df(stripes)` needs nothing but the data.

    python examples/reader.py [input_dir]     # default: writer.py's output
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/goorc_example_stripes"

    from pyspark.sql import SparkSession

    from goorc_spark import engine

    spark = (SparkSession.builder.master("local[4]")
             .appName("goorc_example_reader")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    stripes = engine.read_encoded(spark, src)
    spec = engine.spec_from_stripes(stripes)      # schema from the "footer"
    print("schema:", [(c["name"], c["kind"]) for c in spec])

    rows = engine.decode_df(stripes, spec)
    print("rows:", rows.count())
    rows.orderBy("x").show(5, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

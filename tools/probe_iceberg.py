"""Environmental probe: is an Iceberg runtime available to this Spark?

The north rule targets Iceberg transcript/triple tables. This sandbox is
offline (no pip/apt, no jar downloads), so the probe documents — rather than
assumes — whether `writeTo(...).using("iceberg")` can work here:

  1. scan the pyspark jars directory for iceberg-spark-runtime jars
  2. attempt a real Iceberg catalog session + CREATE TABLE and report the
     exact failure class

Run: python tools/probe_iceberg.py   (prints a verdict; exit 0 either way)
The result is recorded in BENCH.md ("Iceberg availability").
"""

from __future__ import annotations

import glob
import os
import sys


def main() -> None:
    import pyspark

    jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    hits = [
        os.path.basename(p)
        for p in glob.glob(os.path.join(jar_dir, "*.jar"))
        if "iceberg" in os.path.basename(p).lower()
    ]
    print(f"jar scan: {jar_dir}: {len(hits)} iceberg jars {hits}")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg_probe")
        .config(
            "spark.sql.catalog.probe", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config("spark.sql.catalog.probe.type", "hadoop")
        .config("spark.sql.catalog.probe.warehouse", "/tmp/iceberg_probe_wh")
        .getOrCreate()
    )
    try:
        spark.range(3).writeTo("probe.db.t").using("iceberg").createOrReplace()
        n = spark.table("probe.db.t").count()
        print(f"VERDICT: ICEBERG AVAILABLE (round-tripped {n} rows)")
    except Exception as e:  # noqa: BLE001 - the failure class IS the result
        root = e
        print(
            "VERDICT: ICEBERG UNAVAILABLE — "
            f"{type(root).__name__}: {str(root).splitlines()[0][:300]}"
        )
    finally:
        spark.stop()
    sys.exit(0)


if __name__ == "__main__":
    main()

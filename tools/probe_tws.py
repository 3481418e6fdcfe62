"""Environmental probe: can transformWithStateInPandas run here?

Spark 4's typed-state streaming operator (transformWithStateInPandas,
`cliner_spark.streaming.incremental_first_seen`) talks to a JVM state
server over a protobuf protocol; the Python side needs the `google.protobuf`
package. This sandbox is offline (no pip/apt), so the probe documents —
rather than assumes — whether the operator can execute:

  1. import google.protobuf.descriptor (the exact import the streaming
     Python runner performs; observed failure in this container:
     `ModuleNotFoundError: No module named 'google'`)
  2. if available, run a one-micro-batch smoke query end-to-end

Run: python tools/probe_tws.py   (prints a verdict; exit 0 either way)
The result is recorded in BENCH.md ("transformWithStateInPandas
availability"); the operator itself plus its exactly-once restart test are
in cliner_spark/streaming.py / tests/test_streaming_con.py and activate
automatically wherever protobuf exists (any stock Spark 4 cluster).
"""

from __future__ import annotations

import sys


def main() -> int:
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        print(f"transformWithStateInPandas UNAVAILABLE here: {exc!r}")
        print(
            "cause: pyspark's streaming state-server protocol requires the "
            "google.protobuf package, which is not installed and cannot be "
            "installed offline. The operator + test are gated on this probe."
        )
        return 0

    import tempfile

    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql.streaming import StatefulProcessor

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    class P(StatefulProcessor):
        def init(self, handle):  # noqa: ANN001
            self._n = handle.getValueState("n", "n bigint")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._n.update((n,))
            yield pd.DataFrame({"k": [key[0]], "n": [n]})

        def close(self) -> None:
            pass

    d = tempfile.mkdtemp()
    spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int").write.parquet(
        d + "/in"
    )
    q = (
        spark.readStream.schema("k string, v int")
        .parquet(d + "/in")
        .groupBy("k")
        .transformWithStateInPandas(P(), "k string, n bigint", "append", "none")
        .writeStream.format("memory")
        .queryName("tws_probe")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from tws_probe order by k").collect()
    print(f"transformWithStateInPandas AVAILABLE: smoke rows={rows}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

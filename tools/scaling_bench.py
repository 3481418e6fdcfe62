"""Scaling-efficiency harness (BASELINE.json metric: >=0.8 efficiency
between N and 4N executors; SURVEY.md §4.3).

No real cluster exists in this sandbox, so the two "cluster sizes" are two
parallelism levels on the same machine: local[8] vs local[32] over the SAME
generated transcript parquet. Each level runs in its own subprocess (fresh
JVM) so executor-thread count is the only variable.

Usage:
  python tools/scaling_bench.py            # measure, print JSON, update BENCH.md
  python tools/scaling_bench.py --worker local[8] <path> <n_turns>  # internal

Efficiency = (throughput_32 / throughput_8) / (32 / 8). 1.0 = perfect linear.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_TURNS = int(os.environ.get("CLINER_SCALE_TURNS", "400000"))
TX_PATH = "/tmp/cliner_scale_tx"
LEVELS = (8, 32)


def worker(master: str, tx_path: str, n_turns: int) -> None:
    """Run the flagship pipeline once at `master`; print one JSON line."""
    from cliner_spark.pipeline import run_pipeline
    from cliner_spark.session import get_spark

    cores = master[master.index("[") + 1 : master.index("]")]
    spark = get_spark(f"scaling_bench_{cores}", master=master,
                      shuffle_partitions=int(cores))
    spark.sparkContext.setLogLevel("ERROR")
    tx = spark.read.parquet(tx_path)

    # warm-up: JIT + Python-worker spin-up excluded from the measured run
    # (must exercise mapInPandas so the worker pool actually spawns)
    def _ident(it):
        for pdf in it:
            yield pdf

    tx.select("conv_id").repartition(int(cores) * 2).mapInPandas(
        _ident, schema="conv_id string"
    ).count()

    t0 = time.time()
    out = run_pipeline(spark, tx, scanner="udf")
    n_triples = out["triples"].count()
    dt = time.time() - t0
    print(json.dumps({"master": master, "sec": dt, "n_triples": n_triples,
                      "turns_per_sec": n_turns / dt}))
    spark.stop()


def generate(tx_path: str, n_turns: int) -> None:
    from cliner_spark import fixtures
    from cliner_spark.session import get_spark

    spark = get_spark("scaling_bench_gen", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    tx = fixtures.big_transcripts(spark, n_turns=n_turns, n_convs=max(64, n_turns // 200))
    # 64 files so both local[8] and local[32] get balanced input splits
    tx.repartition(64).write.mode("overwrite").parquet(tx_path)
    spark.stop()


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        worker(sys.argv[i + 1], sys.argv[i + 2], int(sys.argv[i + 3]))
        return

    print(f"# generating {N_TURNS} turns at {TX_PATH}", file=sys.stderr)
    generate(TX_PATH, N_TURNS)

    # package for spark-submit --py-files (the north rule's deployment mode);
    # fall back to plain python if spark-submit is unavailable
    from tools.make_dist import make_zip

    zip_path = make_zip()
    spark_submit = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")
    use_submit = os.path.exists(spark_submit)

    results = {}
    for cores in LEVELS:
        master = f"local[{cores}]"
        print(f"# running {master}", file=sys.stderr)
        if use_submit:
            cmd = [
                spark_submit, "--master", master, "--py-files", zip_path,
                os.path.abspath(__file__), "--worker", master, TX_PATH, str(N_TURNS),
            ]
        else:
            cmd = [sys.executable, os.path.abspath(__file__), "--worker", master,
                   TX_PATH, str(N_TURNS)]
        proc = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, check=True,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(f"#   {results[cores]['turns_per_sec']:,.0f} turns/sec", file=sys.stderr)

    lo, hi = LEVELS
    speedup = results[hi]["turns_per_sec"] / results[lo]["turns_per_sec"]
    efficiency = speedup / (hi / lo)
    summary = {
        "n_turns": N_TURNS,
        f"turns_per_sec_local{lo}": round(results[lo]["turns_per_sec"], 1),
        f"turns_per_sec_local{hi}": round(results[hi]["turns_per_sec"], 1),
        f"sec_local{lo}": round(results[lo]["sec"], 2),
        f"sec_local{hi}": round(results[hi]["sec"], 2),
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "pass_0p8": efficiency >= 0.8,
    }
    print(json.dumps(summary))

    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            "# Scaling bench (north rule: efficiency >= 0.8 between N and 4N)\n\n"
            "Two parallelism levels on identical input (no real cluster in "
            "sandbox — see SURVEY.md §4.3): flagship KG pipeline "
            "(scan→link→canonicalize→triples, mapInPandas scanner) over "
            f"{N_TURNS:,} generated transcript turns (64 parquet files).\n\n"
            "| config | wall sec | turns/sec |\n|---|---|---|\n"
            f"| local[{lo}] (N) | {summary[f'sec_local{lo}']} | "
            f"{summary[f'turns_per_sec_local{lo}']:,} |\n"
            f"| local[{hi}] (4N) | {summary[f'sec_local{hi}']} | "
            f"{summary[f'turns_per_sec_local{hi}']:,} |\n\n"
            f"**Speedup {lo}→{hi} cores: {summary['speedup']}× "
            f"(ideal 4×); scaling efficiency = {summary['scaling_efficiency']}"
            f" — {'PASS' if summary['pass_0p8'] else 'FAIL'} (≥0.8 required)**\n\n"
            f"Reproduce: `python tools/scaling_bench.py`\n"
        )


if __name__ == "__main__":
    main()

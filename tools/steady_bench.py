"""Steady-state bench: run every bench.py query for N passes in ONE
Spark session and report the per-query MIN over passes 2..N (pass 1 is
the warmup — JIT, codegen cache, shuffle-file reuse). This is the
"long-running cluster job" view of bench.py's numbers; the driver-run
bench.py stays the cold-start view.

Usage: python tools/steady_bench.py [passes=3] [out.json]
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from logstash_filter_aggregate_spark import get_spark  # noqa: E402


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark(
        app_name="steady_bench", master=f"local[{bench.CPUS}]",
        shuffle_partitions=bench.CPUS,
    )
    tpath = bench._materialize_transcripts(spark)
    n_turns = spark.read.parquet(tpath).count()
    queries = bench.bench_queries(spark, tpath)

    runs: dict[str, list[float]] = {k: [] for k in queries}
    for p in range(passes):
        for name, fn in queries.items():
            t0 = time.perf_counter()
            fn()
            runs[name].append(round(time.perf_counter() - t0, 3))

    steady = {k: min(v[1:]) if len(v) > 1 else v[0] for k, v in runs.items()}
    headline = steady.get("pipeline_example1", 0.0)
    result = {
        "metric": "steady-state per-query sec (min of passes 2..N, one session)",
        "value": round(sum(steady.values()), 3),
        "unit": "sec",
        "queries": steady,
        "all_passes": runs,
        "passes": passes,
        "sf": bench.SF,
        "cpus": bench.CPUS,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1) if headline > 0 else None,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

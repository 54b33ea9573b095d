"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No multi-node cluster exists in this sandbox, so the N -> 4N executor
criterion is evidenced by running the IDENTICAL spark-submit job on the
IDENTICAL input at two local parallelism levels (local[8] vs local[32])
and reporting throughput at both plus
``efficiency = (throughput_32 / throughput_8) / 4`` (target >= 0.8).

Writes BENCH/BASELINE.md. Usage:
    python tools/scaling_bench.py [sf_dir] [turns]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "spark-submit")


def build_zip() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "logstash_filter_aggregate_spark.zip")
    subprocess.run(
        ["zip", "-qr", zpath, "logstash_filter_aggregate_spark"],
        cwd=REPO, check=True,
    )
    return zpath


def materialize_input(turns: int) -> str:
    path = f"/tmp/spark_graft_bench/transcripts_{turns}.parquet"
    if not os.path.exists(f"{path}/_SUCCESS"):
        sys.path.insert(0, REPO)
        from logstash_filter_aggregate_spark import get_spark
        from logstash_filter_aggregate_spark.sources.transcripts import generate_for_turns

        spark = get_spark(app_name="datagen", master="local[32]")
        generate_for_turns(spark, turns, partitions=64).write.mode("overwrite").parquet(path)
        spark.stop()
    return path


def run_at(master: str, zpath: str, input_path: str, config: str, timeout_s: float) -> dict:
    cmd = [
        SPARK_SUBMIT, "--master", master,
        "--conf", "spark.sql.shuffle.partitions=64",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.driver.memory=16g",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zpath,
        os.path.join(REPO, "tools", "submit_job.py"),
        "--input", input_path, "--config", config, "--timeout", str(timeout_s),
    ]
    t0 = time.time()
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=1800)
    if res.returncode != 0:
        raise RuntimeError(f"spark-submit failed:\n{res.stderr[-3000:]}")
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    d["total_wall_s"] = round(time.time() - t0, 1)
    d["master"] = master
    return d


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000_000
    zpath = build_zip()
    input_path = materialize_input(turns)

    runs = {}
    for master in ("local[8]", "local[32]"):
        runs[master] = run_at(master, zpath, input_path, "example1", 3600.0)
        print(json.dumps(runs[master]), flush=True)

    tp8 = runs["local[8]"]["turns_per_sec"]
    tp32 = runs["local[32]"]["turns_per_sec"]
    eff = round(tp32 / tp8 / 4.0, 3)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — two-parallelism scaling evidence

Identical job (`tools/submit_job.py --config example1`, full parse ->
sessionize -> correlate -> route, all five routed buckets) via
`spark-submit --py-files dist/logstash_filter_aggregate_spark.zip`,
identical input ({runs['local[8]']['turns']:,} generated transcript turns
incl. one hot conversation), two parallelism levels (BASELINE.md sandbox
protocol; sf ref {sf_dir}).

Input sizing note: the scaling criterion assumes the compute-dominated
regime (the 100 TB target), so the input is sized such that per-core
work far exceeds the ~10 s of core-count-independent driver time (plan
construction, Catalyst analysis, AQE, stage scheduling). At small inputs
(3M turns) that fixed time dominates wall clock and the measured
"efficiency" reflects driver overhead, not the data path.

| run | master | turns | pipeline wall s | turns/sec | efficiency vs 8-core |
|---|---|---|---|---|---|
| A | local[8]  | {runs['local[8]']['turns']:,} | {runs['local[8]']['wall_s']} | {tp8:,} | 1.0 (base) |
| B | local[32] | {runs['local[32]']['turns']:,} | {runs['local[32]']['wall_s']} | {tp32:,} | **{eff}** (target >= 0.8) |

efficiency = (turns/sec at local[32] / turns/sec at local[8]) / 4 = {eff}

Raw JSON:
```
{json.dumps(runs['local[8]'])}
{json.dumps(runs['local[32]'])}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()

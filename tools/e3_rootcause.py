"""Root-cause the example #3 fan-out N -> 4N scaling miss (VERDICT r3
item 4): run the identical e3 jobs at local-cluster[1,2] and
local-cluster[4,2] WITH Spark event logs enabled, aggregate per-stage
wall / executor-run / shuffle metrics (tools/stage_profile.py), and
report which stages stop scaling — plus a sessions-only contrast pair
at the same moment, so a box-wide bandwidth ceiling is distinguishable
from a plan defect.

Writes BENCH/e3_rootcause_r4.json. Legs run strictly sequentially
(overlapping Spark work poisons the numbers on this box).

Usage: python tools/e3_rootcause.py [turns]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.scaling_bench import build_zip, materialize_input  # noqa: E402
from tools.stage_profile import profile  # noqa: E402

SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "spark-submit")
LOCAL_DIR = os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")


def run_leg(master: str, zpath: str, input_path: str, buckets: str, tag: str) -> dict:
    ev_dir = f"/tmp/spark-events/{tag}"
    shutil.rmtree(ev_dir, ignore_errors=True)
    os.makedirs(ev_dir, exist_ok=True)
    os.makedirs(LOCAL_DIR, exist_ok=True)
    env = dict(os.environ, SPARK_HOME=os.environ.get("SPARK_HOME", "/opt/spark"))
    conf = {
        "spark.sql.shuffle.partitions": "32",
        "spark.sql.adaptive.enabled": "true",
        "spark.driver.memory": "8g",
        "spark.local.dir": LOCAL_DIR,
        "spark.ui.enabled": "false",
        "spark.eventLog.enabled": "true",
        "spark.eventLog.compress": "false",
        "spark.eventLog.dir": f"file://{ev_dir}",
    }
    cmd = [SPARK_SUBMIT, "--master", master]
    for k, v in conf.items():
        cmd += ["--conf", f"{k}={v}"]
    cmd += [
        "--py-files", zpath,
        os.path.join(REPO, "tools", "submit_job.py"),
        "--input", input_path, "--config", "example3", "--timeout", "300",
        "--buckets", buckets,
    ]
    t0 = time.time()
    res = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=3600, env=env)
    if res.returncode != 0:
        raise RuntimeError(f"spark-submit failed ({tag}):\n{res.stderr[-3000:]}")
    line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    d["master"] = master
    d["tag"] = tag
    # record the effective conf per leg so raw artifacts are auditable
    d["conf"] = {k: v for k, v in conf.items()
                 if k not in ("spark.local.dir", "spark.eventLog.dir")}
    d["conf_overrides"] = {}
    logs = [f for f in os.listdir(ev_dir) if not f.startswith(".")]
    d["stages"] = profile(os.path.join(ev_dir, logs[0])) if logs else []
    print(json.dumps({k: d[k] for k in ("tag", "master", "wall_s", "turns_per_sec")}), flush=True)
    return d


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000_000
    zpath = build_zip()
    input_path = materialize_input(turns)
    fanout = "completed,timeout,inline,open,passthrough"
    legs = [
        ("e3_fanout_N", "local-cluster[1,2,8192]", fanout),
        ("e3_fanout_4N", "local-cluster[4,2,8192]", fanout),
        ("e3_sessions_N", "local-cluster[1,2,8192]", "sessions"),
        ("e3_sessions_4N", "local-cluster[4,2,8192]", "sessions"),
    ]
    runs = {}
    for tag, master, buckets in legs:
        runs[tag] = run_leg(master, zpath, input_path, buckets, tag)

    for fam in ("e3_fanout", "e3_sessions"):
        tp1 = runs[f"{fam}_N"]["turns_per_sec"]
        tp4 = runs[f"{fam}_4N"]["turns_per_sec"]
        print(f"{fam}: N={tp1} 4N={tp4} efficiency={round(tp4 / tp1 / 4, 3)}", flush=True)

    out = os.path.join(REPO, "BENCH", "e3_rootcause_r4.json")
    with open(out, "w") as f:
        json.dump(runs, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

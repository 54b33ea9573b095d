"""Aggregate per-stage metrics from a Spark event log (JSONL).

Used by tools/e3_rootcause.py to name the non-scaling stage in the
N -> 4N comparison (VERDICT r3 item 4): for each completed stage it
reports wall time (submission -> completion), summed executor run time,
task count, and shuffle/input volumes. Comparing the same job's stages
across two cluster sizes separates "this stage's WORK inflated at 4N"
(memory-bandwidth / IO contention: run time grows) from "this stage
stopped parallelizing" (wall flat while run time constant).

Usage: python tools/stage_profile.py <event-log-file> [--json]
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def _event_files(path: str) -> list[str]:
    """A Spark event log is either a single file or (Spark 3.4+/4 rolling
    mode) a directory ``eventlog_v2_<app>/`` of ``events_*`` parts."""
    if os.path.isfile(path):
        return [path]
    out = []
    for name in sorted(os.listdir(path)):
        p = os.path.join(path, name)
        if os.path.isdir(p):
            out.extend(_event_files(p))
        elif name.startswith("events_") or name.startswith("eventlog"):
            out.append(p)
    return out


def profile(path: str) -> list[dict]:
    stages: dict[int, dict] = {}
    tasks = defaultdict(lambda: dict(n=0, run_ms=0, gc_ms=0, shuffle_read=0,
                                     shuffle_write=0, input_bytes=0, spill=0))
    for part in _event_files(path):
        _consume(part, stages, tasks)
    out = []
    for sid, s in sorted(stages.items()):
        t = tasks.get(sid, {})
        s.update(
            run_s=round(t.get("run_ms", 0) / 1000.0, 1),
            gc_s=round(t.get("gc_ms", 0) / 1000.0, 1),
            input_mb=round(t.get("input_bytes", 0) / 1e6, 1),
            shuffle_read_mb=round(t.get("shuffle_read", 0) / 1e6, 1),
            shuffle_write_mb=round(t.get("shuffle_write", 0) / 1e6, 1),
            spill_mb=round(t.get("spill", 0) / 1e6, 1),
        )
        out.append(s)
    return out


def _consume(path: str, stages: dict, tasks) -> None:
    with open(path, errors="ignore") as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                info = ev["Stage Info"]
                sid = info["Stage ID"]
                stages[sid] = dict(
                    stage_id=sid,
                    name=info.get("Stage Name", "")[:80],
                    n_tasks=info.get("Number of Tasks"),
                    wall_s=round(
                        (info.get("Completion Time", 0) - info.get("Submission Time", 0))
                        / 1000.0, 1,
                    ),
                )
            elif e == "SparkListenerTaskEnd":
                sid = ev.get("Stage ID")
                m = ev.get("Task Metrics") or {}
                t = tasks[sid]
                t["n"] += 1
                t["run_ms"] += m.get("Executor Run Time", 0)
                t["gc_ms"] += m.get("JVM GC Time", 0)
                t["spill"] += m.get("Disk Bytes Spilled", 0)
                t["input_bytes"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                t["shuffle_read"] += srm.get("Local Bytes Read", 0) + srm.get(
                    "Remote Bytes Read", 0
                )
                t["shuffle_write"] += (m.get("Shuffle Write Metrics") or {}).get(
                    "Shuffle Bytes Written", 0
                )


def main() -> None:
    rows = profile(sys.argv[1])
    if "--json" in sys.argv:
        print(json.dumps(rows))
        return
    hdr = ("sid", "wall_s", "run_s", "gc_s", "tasks", "input_mb", "sh_r_mb", "sh_w_mb", "spill_mb", "name")
    print(("{:>4} {:>7} {:>8} {:>6} {:>6} {:>9} {:>8} {:>8} {:>8}  {}").format(*hdr))
    for s in rows:
        print(
            "{:>4} {:>7} {:>8} {:>6} {:>6} {:>9} {:>8} {:>8} {:>8}  {}".format(
                s["stage_id"], s["wall_s"], s["run_s"], s["gc_s"], s["n_tasks"],
                s["input_mb"], s["shuffle_read_mb"], s["shuffle_write_mb"],
                s["spill_mb"], s["name"],
            )
        )


if __name__ == "__main__":
    main()

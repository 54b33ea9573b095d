"""Per-query stage attribution from a Spark event log.

Groups stages by the job description set around each bench query
(``Q:<name>``, bench_extra.py profile mode) and prints, per query, the
dominant stages with wall time, summed executor run time, GC, shuffle
volumes and spill — the guide §1 "which stage is the money going to"
view without a live UI.

Usage: python tools/job_profile.py <event-log-file-or-dir> [--json]
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict

from stage_profile import _event_files  # noqa: E402


def profile(path: str) -> dict:
    job_desc: dict[int, str] = {}
    job_stages: dict[int, list[int]] = {}
    stages: dict[int, dict] = {}
    tasks = defaultdict(lambda: dict(n=0, run_ms=0, gc_ms=0, shuffle_read=0,
                                     shuffle_write=0, input_bytes=0, spill=0,
                                     result_ser_ms=0, deser_ms=0, fetch_wait_ms=0,
                                     write_ms=0, max_task_ms=0))
    for part in _event_files(path):
        with open(part, errors="ignore") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(ev, dict):
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    job_desc[jid] = (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    )
                    job_stages[jid] = [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ]
                elif e == "SparkListenerStageCompleted":
                    info = ev["Stage Info"]
                    sid = info["Stage ID"]
                    stages[sid] = dict(
                        stage_id=sid,
                        name=info.get("Stage Name", "")[:60],
                        n_tasks=info.get("Number of Tasks"),
                        wall_s=round(
                            (info.get("Completion Time", 0) - info.get("Submission Time", 0))
                            / 1000.0, 2,
                        ),
                    )
                elif e == "SparkListenerTaskEnd":
                    sid = ev.get("Stage ID")
                    m = ev.get("Task Metrics") or {}
                    t = tasks[sid]
                    t["n"] += 1
                    rt = m.get("Executor Run Time", 0)
                    t["run_ms"] += rt
                    t["max_task_ms"] = max(t["max_task_ms"], rt)
                    t["gc_ms"] += m.get("JVM GC Time", 0)
                    t["spill"] += m.get("Disk Bytes Spilled", 0)
                    t["result_ser_ms"] += m.get("Result Serialization Time", 0)
                    t["deser_ms"] += m.get("Executor Deserialize Time", 0)
                    t["input_bytes"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0)
                    srm = m.get("Shuffle Read Metrics") or {}
                    t["fetch_wait_ms"] += srm.get("Fetch Wait Time", 0)
                    t["shuffle_read"] += srm.get("Local Bytes Read", 0) + srm.get(
                        "Remote Bytes Read", 0
                    )
                    swm = m.get("Shuffle Write Metrics") or {}
                    t["shuffle_write"] += swm.get("Shuffle Bytes Written", 0)
                    t["write_ms"] += swm.get("Shuffle Write Time", 0) // 1_000_000

    by_query: dict[str, list[dict]] = defaultdict(list)
    for jid, desc in job_desc.items():
        q = desc[2:] if desc.startswith("Q:") else (desc or "<none>")
        for sid in job_stages.get(jid, []):
            if sid not in stages:
                continue  # skipped stage (reused exchange)
            s = dict(stages[sid])
            t = tasks.get(sid, {})
            s.update(
                run_s=round(t.get("run_ms", 0) / 1000.0, 2),
                max_task_s=round(t.get("max_task_ms", 0) / 1000.0, 2),
                gc_s=round(t.get("gc_ms", 0) / 1000.0, 2),
                fetch_wait_s=round(t.get("fetch_wait_ms", 0) / 1000.0, 2),
                input_mb=round(t.get("input_bytes", 0) / 1e6, 1),
                sh_read_mb=round(t.get("shuffle_read", 0) / 1e6, 1),
                sh_write_mb=round(t.get("shuffle_write", 0) / 1e6, 1),
                spill_mb=round(t.get("spill", 0) / 1e6, 1),
            )
            by_query[q].append(s)
    # dedupe stages listed under several jobs of one query
    for q in by_query:
        seen = {}
        for s in by_query[q]:
            seen[s["stage_id"]] = s
        by_query[q] = sorted(seen.values(), key=lambda s: -s["wall_s"])
    return dict(by_query)


def main() -> None:
    rows = profile(sys.argv[1])
    if "--json" in sys.argv:
        print(json.dumps(rows))
        return
    for q, ss in rows.items():
        tot_wall = round(sum(s["wall_s"] for s in ss), 2)
        print(f"\n=== {q}  (sum stage wall {tot_wall}s, {len(ss)} stages)")
        hdr = ("sid", "wall", "run", "maxT", "gc", "fwait", "tasks", "in_mb",
               "shr_mb", "shw_mb", "spill", "name")
        print("{:>5} {:>6} {:>7} {:>6} {:>5} {:>6} {:>6} {:>8} {:>7} {:>7} {:>6}  {}".format(*hdr))
        for s in ss[:12]:
            print("{:>5} {:>6} {:>7} {:>6} {:>5} {:>6} {:>6} {:>8} {:>7} {:>7} {:>6}  {}".format(
                s["stage_id"], s["wall_s"], s["run_s"], s["max_task_s"], s["gc_s"],
                s["fetch_wait_s"], s["n_tasks"], s["input_mb"], s["sh_read_mb"],
                s["sh_write_mb"], s["spill_mb"], s["name"]))


if __name__ == "__main__":
    main()

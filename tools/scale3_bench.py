"""Third data-scale point (VERDICT r3 item 6): the headline pipeline
queries at 120M turns (3M sf0.1 -> 30M r3 -> 120M here, one more ~4x
step), plus the peak-memory figure for the exact age-cap scan's 1M-row
single-Arrow-group hot task.

Peak memory is sampled from /proc every 0.3s across the bench
subprocess's descendant tree: the JVM's resident peak bounds executor
memory, and the largest single python worker RSS bounds the Arrow group
materialization (the quantity that would OOM a real executor's python
worker if a hot task outgrew it).

Writes BENCH/bench_r4_120M_turns.json. Run exclusively (no concurrent
Spark work). Usage: python tools/scale3_bench.py [turns]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _descendants(root_pid: int) -> list[int]:
    children: dict[int, list[int]] = {}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            ppid = int(parts[3])
        except (OSError, IndexError, ValueError):
            continue
        children.setdefault(ppid, []).append(int(pid))
    out, stack = [], [root_pid]
    while stack:
        p = stack.pop()
        out.append(p)
        stack.extend(children.get(p, []))
    return out


def _rss_and_comm(pid: int) -> tuple[int, str]:
    try:
        with open(f"/proc/{pid}/status") as f:
            txt = f.read()
        rss = 0
        for line in txt.splitlines():
            if line.startswith("VmRSS:"):
                rss = int(line.split()[1]) * 1024
                break
        with open(f"/proc/{pid}/comm") as f:
            comm = f.read().strip()
        return rss, comm
    except OSError:
        return 0, ""


class PeakSampler(threading.Thread):
    def __init__(self, root_pid: int):
        super().__init__(daemon=True)
        self.root_pid = root_pid
        self.stop_flag = False
        self.peak_total = 0
        self.peak_jvm = 0
        self.peak_python_worker = 0

    def run(self) -> None:
        while not self.stop_flag:
            total = jvm = pyw = 0
            for pid in _descendants(self.root_pid):
                rss, comm = _rss_and_comm(pid)
                total += rss
                if comm == "java":
                    jvm = max(jvm, rss)
                elif comm.startswith("python") and pid != self.root_pid:
                    pyw = max(pyw, rss)
            self.peak_total = max(self.peak_total, total)
            self.peak_jvm = max(self.peak_jvm, jvm)
            self.peak_python_worker = max(self.peak_python_worker, pyw)
            time.sleep(0.3)


def run_bench(turns: int, only: str, sample: bool) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_TURNS=str(turns),
        SPARK_GRAFT_BENCH_ONLY=only,
    )
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py")],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, cwd=REPO, env=env,
    )
    sampler = None
    if sample:
        sampler = PeakSampler(proc.pid)
        sampler.start()
    out, _ = proc.communicate(timeout=5400)
    if sampler:
        sampler.stop_flag = True
        sampler.join(2)
    if proc.returncode != 0:
        raise RuntimeError(f"bench failed rc={proc.returncode}")
    d = json.loads([ln for ln in out.splitlines() if ln.startswith("{")][-1])
    if sampler:
        d["peak_rss_total_mb"] = round(sampler.peak_total / 1e6)
        d["peak_rss_jvm_mb"] = round(sampler.peak_jvm / 1e6)
        d["peak_rss_python_worker_mb"] = round(sampler.peak_python_worker / 1e6)
    return d


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000_000
    big = run_bench(
        turns, "pipeline_example1,passthrough_route,hotskew_plain,hotskew_prereduced",
        sample=False,
    )
    print(json.dumps(big), flush=True)
    # the exact-scan peak-memory figure runs at the standard bench size
    # (the hot task is the fixed 1M-row single conversation either way)
    exact = run_bench(3_000_000, "exact_age_hot_task", sample=True)
    print(json.dumps(exact), flush=True)
    out = dict(scale_point=big, exact_age_peak=exact)
    with open(os.path.join(REPO, "BENCH", "bench_r4_120M_turns.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote BENCH/bench_r4_120M_turns.json")


if __name__ == "__main__":
    main()

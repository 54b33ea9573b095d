"""Interleaved version-A/B steady bench (the r5 verdict's protocol fix):
alternate two source trees per leg, each leg a FRESH process running
`tools/steady_bench.py 2` (1 warmup + 1 steady pass), so round-over-round
claims come from pairs measured minutes apart instead of sessions hours
apart (the driftcheck showed ±30–45 % host drift across a round).

Legs are separate processes, not in-session module swaps, on purpose:
pyspark's local-mode Python workers resolve the package from the
PYTHONPATH captured at JVM start, so a driver-side sys.path swap would
run version A on executors while the driver thinks it runs version B.

Usage: python tools/ab_bench.py <treeA> <treeB> [pairs=3] [out.json]
(treeX = repo roots, e.g. a git worktree of the previous round's tip
 and the current checkout; labels are the basenames)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_leg(tree: str, out: str) -> dict:
    env = {**os.environ, "PYTHONPATH": tree}
    subprocess.run(
        [sys.executable, os.path.join(tree, "tools", "steady_bench.py"), "2", out],
        cwd=tree, env=env, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    with open(out) as f:
        return json.load(f)


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out_path = sys.argv[4] if len(sys.argv) > 4 else None
    la, lb = (os.path.basename(os.path.abspath(t)) for t in (tree_a, tree_b))
    legs: list[dict] = []
    for i in range(pairs):
        for label, tree in ((la, tree_a), (lb, tree_b)):
            res = run_leg(tree, f"/tmp/ab_leg_{label}_{i}.json")
            legs.append({"pair": i, "version": label, "total_s": res["value"],
                         "queries": res["queries"]})
            print(json.dumps({k: legs[-1][k] for k in ("pair", "version", "total_s")}),
                  flush=True)
    # per-pair deltas + per-version min-of-pairs per query
    deltas = []
    for i in range(pairs):
        a = next(l for l in legs if l["pair"] == i and l["version"] == la)
        b = next(l for l in legs if l["pair"] == i and l["version"] == lb)
        deltas.append(round((b["total_s"] - a["total_s"]) / a["total_s"] * 100, 1))
    qnames = legs[0]["queries"].keys()
    per_query = {
        q: {
            la: min(l["queries"][q] for l in legs if l["version"] == la),
            lb: min(l["queries"].get(q, float("nan")) for l in legs if l["version"] == lb),
        }
        for q in qnames
    }
    doc = {
        "metric": f"interleaved steady A/B {la} vs {lb} (paired fresh-process legs)",
        "pairs": pairs,
        "legs": legs,
        "pair_delta_pct_b_vs_a": deltas,
        "per_query_min": per_query,
    }
    print(json.dumps({"pair_delta_pct_b_vs_a": deltas}))
    if out_path:
        with open(out_path, "w") as f:
            f.write(json.dumps(doc) + "\n")


if __name__ == "__main__":
    main()

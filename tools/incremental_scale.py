"""Scale exercise for the batch-incremental dedup store: ingest the
100× sweep corpus (500k docs) as a sequence of arrival batches through
``incremental_exact_dedup`` and record per-batch wall, store growth,
and the pruned-read fraction — the evidence that the store path's cost
stays ~flat per batch while the store grows.

Also runs a final ``compact_store`` and re-checks a probe batch against
the compacted store (same rejects), timing the listing-bound read
before/after.

Usage: python tools/incremental_scale.py [batches=10] [out.json]
(needs /tmp/spark_graft_sweep100 from tools/make_sweep100.py)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from logstash_filter_aggregate_spark import get_spark  # noqa: E402
from logstash_filter_aggregate_spark.operators.incremental import (  # noqa: E402
    compact_store,
    incremental_exact_dedup,
)

CORPUS = "/tmp/spark_graft_sweep100/documents.parquet"
STORE = "/tmp/spark_graft_incscale/store"


def main() -> None:
    batches = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="incremental_scale", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    if not os.path.exists(CORPUS):
        raise SystemExit(f"run tools/make_sweep100.py first ({CORPUS} missing)")
    shutil.rmtree(os.path.dirname(STORE), ignore_errors=True)
    d = spark.read.parquet(CORPUS).select("doc_id", "text")
    n = d.count()
    hi = d.agg(F.max("doc_id")).first()[0] + 1
    step = (hi + batches - 1) // batches
    legs = []
    survivors = 0
    for b in range(batches):
        lo, up = b * step, min((b + 1) * step, hi)
        t0 = time.time()
        out = incremental_exact_dedup(
            d.where(f"doc_id >= {lo} and doc_id < {up}"), STORE, batch_id=b
        )
        kept = out.count()
        wall = time.time() - t0
        survivors += kept
        legs.append({"batch": b, "id_span": up - lo, "kept": kept,
                     "wall_s": round(wall, 2)})
        print(json.dumps(legs[-1]), flush=True)
    # one-shot relation check
    t0 = time.time()
    one_shot = (
        d.groupBy(F.md5(F.trim(F.regexp_replace(F.lower("text"), r"[^a-z0-9]+", " "))))
        .count().count()
    )
    check_s = time.time() - t0
    ok = survivors == one_shot
    # compaction: listing cost before/after on a probe read
    def probe_read():
        t = time.time()
        spark.read.option("basePath", STORE).parquet(STORE).count()
        return round(time.time() - t, 2)

    pre_read = probe_read()
    t0 = time.time()
    comp = compact_store(spark, STORE, keep_last=1)
    comp_s = round(time.time() - t0, 2)
    post_read = probe_read()
    doc = {
        "metric": "incremental exact dedup over the 100x corpus, batched",
        "docs": n, "batches": batches, "survivors": survivors,
        "one_shot_distinct": one_shot, "survivors_match": ok,
        "one_shot_check_s": round(check_s, 2),
        "legs": legs,
        "compaction": {"summary": comp, "wall_s": comp_s,
                       "full_read_before_s": pre_read,
                       "full_read_after_s": post_read},
        "cpus": cpus,
    }
    print(json.dumps({k: v for k, v in doc.items() if k != "legs"}))
    if out_path:
        with open(out_path, "w") as f:
            f.write(json.dumps(doc) + "\n")
    if not ok:
        raise SystemExit("survivors != one-shot distinct contents")


if __name__ == "__main__":
    main()

"""End-to-end Structured Streaming throughput for the r5-vectorized
gated state walks, at bench scale (the sf0.1 3M-turn transcript corpus
by default).

Three queries, each a file-source stream driven to completion with
``Trigger.AvailableNow`` into a noop sink (timings measure compute):

- ``passthrough_ungated``: example #3 (all create_or_update) — the
  stateless tier (batch column ops on the stream, full codegen).
- ``passthrough_gated``: example #1 (guarded update rule) — every
  participating row rides the keyed numpy session-hop walk.
- ``correlate_gated``: full map-lifecycle streaming correlation
  (example #1), closed maps out.

Batch sizing: the whole corpus arrives in one availableNow run;
``maxFilesPerTrigger`` splits it into micro-batches so per-batch state
walks and watermark advancement are exercised (not one giant batch).

Usage: python tools/streaming_bench.py [turns=3000000] [max_files=8] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from logstash_filter_aggregate_spark import get_spark  # noqa: E402
from logstash_filter_aggregate_spark.plans.pipeline import (  # noqa: E402
    example1_config,
    example3_config,
)
from logstash_filter_aggregate_spark.streaming.stream import (  # noqa: E402
    streaming_correlate,
    streaming_passthrough,
)

WORK = "/tmp/spark_graft_streambench"


def drive(spark, src_path: str, schema, build, name: str, max_files: int) -> tuple[float, int | None]:
    cp = f"{WORK}/cp_{name}"
    shutil.rmtree(cp, ignore_errors=True)
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(src_path)
    )
    out = build(src)
    t0 = time.time()
    q = (
        out.writeStream.format("noop")
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    progress = q.lastProgress
    return wall, (progress or {}).get("batchId")


def main() -> None:
    turns = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    max_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="streaming_bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    src_path = f"/tmp/spark_graft_bench/transcripts_{turns}.parquet"
    if not os.path.exists(f"{src_path}/_SUCCESS"):
        from logstash_filter_aggregate_spark.sources.transcripts import generate_for_turns

        generate_for_turns(spark, turns, partitions=64).write.mode("overwrite").parquet(src_path)
    static = spark.read.parquet(src_path)
    schema = static.schema
    n = static.count()

    cfg1 = example1_config(timeout=3600.0)
    cfg3 = example3_config(timeout=600.0)
    shards = int(os.environ.get("SPARK_GRAFT_STREAM_SHARDS", "512"))
    queries = {
        "passthrough_ungated": lambda src: streaming_passthrough(src, cfg3),
        "passthrough_gated": lambda src: streaming_passthrough(src, cfg1),
        "passthrough_gated_sharded": lambda src: streaming_passthrough(
            src, cfg1, shards=shards
        ),
        "correlate_gated": lambda src: streaming_correlate(src, cfg1),
        "correlate_gated_sharded": lambda src: streaming_correlate(
            src, cfg1, shards=shards
        ),
    }
    only = os.environ.get("SPARK_GRAFT_STREAM_QUERIES")
    if only:
        keep = set(only.split(","))
        queries = {k: v for k, v in queries.items() if k in keep}
    results = {}
    for name, build in queries.items():
        wall, last_batch = drive(spark, src_path, schema, build, name, max_files)
        results[name] = {
            "wall_s": round(wall, 2),
            "turns_per_sec": round(n / wall, 1),
            "batches": (last_batch + 1) if last_batch is not None else None,
        }
        print(json.dumps({name: results[name]}), flush=True)

    doc = {
        "metric": "structured-streaming end-to-end throughput (availableNow -> noop)",
        "turns": n,
        "max_files_per_trigger": max_files,
        "cpus": cpus,
        "shards": shards,
        "queries": results,
    }
    line = json.dumps(doc)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

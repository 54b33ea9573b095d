"""Extra benchmark harness for optimization work (bench.py is FROZEN for
measurement — this file hosts everything else).

Modes:
  python bench_extra.py profile   — run the bench.py query set with event
      logging + per-query job descriptions; prints per-query wall and
      writes the event log path for tools/job_profile.py.
  python bench_extra.py only Q1,Q2 [reps]  — time a subset, fresh session,
      same methodology as bench.py (noop sink, warmup).

Uses the same $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS contract as
bench.py and imports its query definitions so the timed computation is
identical.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

EVLOG_DIR = "/tmp/spark_graft_evlog"


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "profile"
    os.makedirs(EVLOG_DIR, exist_ok=True)

    from logstash_filter_aggregate_spark import get_spark

    import bench

    cpus = bench.CPUS
    extra = {}
    if mode == "profile":
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVLOG_DIR}",
        }
    spark = get_spark(
        app_name=f"bench_extra_{mode}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf=extra,
    )
    app_id = spark.sparkContext.applicationId
    tpath = bench._materialize_transcripts(spark)
    queries = bench.bench_queries(spark, tpath)

    names = list(queries)
    reps = 1
    if mode == "only":
        names = [q.strip() for q in sys.argv[2].split(",") if q.strip()]
        if len(sys.argv) > 3:
            reps = int(sys.argv[3])

    # same warmup as bench.py
    from pyspark.sql import functions as F  # noqa: F401
    from logstash_filter_aggregate_spark.plans.pipeline import (
        example1_config,
        example3_config,
        run_pipeline,
    )

    n_turns = spark.read.parquet(tpath).count()
    t_small = spark.read.parquet(tpath).limit(max(n_turns // 100, 1000))
    bench._noop(run_pipeline(spark, t_small, example1_config(timeout=3600.0)).sessions)
    bench._noop(
        run_pipeline(
            spark, t_small.limit(2000),
            example3_config(timeout=600.0, inactivity_timeout=600.0, exact_age_cap=True),
        ).sessions
    )

    timings: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"Q:{name}")
            t0 = time.perf_counter()
            queries[name]()
            timings[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "queries": {n: timings[n] for n in names},
        "min": {n: min(timings[n]) for n in names},
        "event_log": os.path.join(EVLOG_DIR, app_id) if mode == "profile" else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

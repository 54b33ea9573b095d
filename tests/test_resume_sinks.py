"""Resumable runs (O21 analog) + routed sinks with lineage manifest."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.plans.pipeline import (
    example1_config,
    example3_config,
    example4_config,
    run_pipeline,
)
from logstash_filter_aggregate_spark.sources.transcripts import generate_transcripts
from logstash_filter_aggregate_spark.sinks import RunManifest, write_run
from tests.conftest import T0


def _fp(df):
    cols = sorted(df.columns)
    return sorted(map(str, df.select(*cols).collect()))


SPLIT = T0 + dt.timedelta(seconds=60)


@pytest.mark.parametrize("cfg_fn", [example1_config, example3_config])
def test_resume_equals_single_run(spark, cfg_fn):
    # split the stream at an arbitrary boundary; chunk1's open maps seed
    # chunk2; outputs must equal the unsplit run exactly (spec:268-307
    # persistence round-trip, generalized)
    cfg = cfg_fn(timeout=3600.0)
    full = generate_transcripts(spark, n_convs=36, hot_convs=1, hot_turns=30)
    c1 = full.where(F.col("ts") < F.lit(SPLIT))
    c2 = full.where(F.col("ts") >= F.lit(SPLIT))
    assert c1.count() > 0 and c2.count() > 0

    ref = run_pipeline(spark, full, cfg)
    a = run_pipeline(spark, c1, cfg)
    open_a = a.open.localCheckpoint()  # materialize: the "persisted maps"
    b = run_pipeline(spark, c2, cfg, open_maps=open_a)

    assert sorted(_fp(a.completed) + _fp(b.completed)) == _fp(ref.completed)
    assert _fp(b.open) == _fp(ref.open)
    # timeout pushes: sessions expired in chunk1 against its own watermark
    # may surface in run A instead of run B, but the union must match
    assert sorted(_fp(a.timeout) + _fp(b.timeout)) == _fp(ref.timeout)


TOWN_ROWS = [
    ("c1", 0, "user", "INFO - fr - Town - paris", "none", T0),
    ("c1", 1, "user", "INFO - fr - Town - lyon", "none", T0 + dt.timedelta(seconds=2)),
    ("c1", 2, "user", "INFO - fr - Town - nice", "none", T0 + dt.timedelta(seconds=70)),
    ("c1", 3, "user", "INFO - es - Town - madrid", "none", T0 + dt.timedelta(seconds=72)),
]
_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def test_resume_merges_collect_list(spark):
    # collect_list seed merge: open maps carry the prior array; same
    # towns-collecting rule but WITHOUT push_previous (maps stay open)
    cfg = example4_config(timeout=3600.0, push_previous_map_as_event=False)
    full = spark.createDataFrame(TOWN_ROWS, _SCHEMA)
    c1 = full.where(F.col("ts") < F.lit(SPLIT))
    c2 = full.where(F.col("ts") >= F.lit(SPLIT))

    a = run_pipeline(spark, c1, cfg)
    b = run_pipeline(spark, c2, cfg, open_maps=a.open.localCheckpoint())
    merged = {r.task_id: [t.town_name for t in r.towns] for r in b.open.collect()}
    assert merged == {"fr": ["paris", "lyon", "nice"], "es": ["madrid"]}


def test_push_previous_restart_loses_runs_like_reference(spark):
    # with push_previous, a shutdown force-flushes every map
    # (aggregate.rb:341-344 + shift()); restarting mid-run therefore
    # splits the fr run — exactly what the reference does across restarts
    cfg = example4_config(timeout=3600.0)
    full = spark.createDataFrame(TOWN_ROWS, _SCHEMA)
    c1 = full.where(F.col("ts") < F.lit(SPLIT))
    c2 = full.where(F.col("ts") >= F.lit(SPLIT))
    a = run_pipeline(spark, c1, cfg)
    assert a.open.count() == 0  # nothing left to persist
    b = run_pipeline(spark, c2, cfg, open_maps=a.open.localCheckpoint())
    pushed_a = {r.task_id: [t.town_name for t in r.towns] for r in a.timeout.collect()}
    pushed_b = {r.task_id: [t.town_name for t in r.towns] for r in b.timeout.collect()}
    assert pushed_a == {"fr": ["paris", "lyon"]}
    assert pushed_b == {"fr": ["nice"], "es": ["madrid"]}


def test_write_routed_sinks_and_manifest(spark, tmp_path):
    base = str(tmp_path / "out")
    cfg = example1_config(timeout=3600.0)
    t = generate_transcripts(spark, n_convs=24)
    out = run_pipeline(spark, t, cfg)
    m = write_run(spark, out, t, base, cfg, input_desc="gen24")

    assert m.sinks["completed"]["rows"] == out.completed.count()
    assert m.sinks["passthrough"]["rows"] == out.passthrough.count()
    back = spark.read.parquet(m.sinks["completed"]["path"])
    assert back.count() == m.sinks["completed"]["rows"]

    # lineage: manifest reload + resume skips completed sinks
    m2 = RunManifest.load(base, m.run_id)
    assert m2 is not None and all(v["done"] for v in m2.sinks.values())
    t0 = m2.sinks["completed"]["wall_s"]
    m3 = write_run(spark, out, t, base, cfg, input_desc="gen24")
    assert m3.sinks["completed"]["wall_s"] == t0  # untouched -> was skipped

    # per-partition lineage table exists
    pm = spark.read.parquet(m.sinks["_partitions"]["path"])
    assert {"input_file", "rows", "min_ts", "max_ts"} <= set(pm.columns)


def test_seed_schema_validation(spark):
    from logstash_filter_aggregate_spark.config import ConfigurationError
    from logstash_filter_aggregate_spark.plans.resume import seed_rows_from_open

    cfg = example1_config()
    bogus = spark.createDataFrame([("x",)], "task_id string")
    with pytest.raises(ConfigurationError, match="lacks aggregate columns"):
        seed_rows_from_open(bogus, cfg)


@pytest.mark.parametrize("exact", [False, True])
def test_resume_age_cap_crosses_after_split(spark, exact):
    # the absolute timeout crosses AFTER the split boundary: the resumed
    # run must age the seeded map from its true creation (_seed_creation_ts),
    # not from the seed row's position ts (= prior lastevent_ts)
    cfg = example3_config(timeout=100.0, inactivity_timeout=100.0, exact_age_cap=exact)
    rows = [
        ("c1", 0, "user", "INFO - t - Clicked One", "none", T0),
        ("c1", 1, "user", "INFO - t - Clicked Two", "none", T0 + dt.timedelta(seconds=50)),
        ("c1", 2, "user", "INFO - t - Clicked Three", "none", T0 + dt.timedelta(seconds=90)),
        ("c1", 3, "user", "INFO - t - Clicked Four", "none", T0 + dt.timedelta(seconds=120)),
    ]
    full = spark.createDataFrame(rows, _SCHEMA)
    c1 = full.where(F.col("ts") < F.lit(SPLIT))
    c2 = full.where(F.col("ts") >= F.lit(SPLIT))

    ref = run_pipeline(spark, full, cfg)
    a = run_pipeline(spark, c1, cfg)
    b = run_pipeline(spark, c2, cfg, open_maps=a.open.localCheckpoint())
    # full run: {0,50,90} expires when +120 arrives (age 120 > 100) → pushed
    assert [r.clicks for r in ref.timeout.collect()] == [3]
    assert sorted(_fp(a.timeout) + _fp(b.timeout)) == _fp(ref.timeout)
    assert _fp(b.open) == _fp(ref.open)


def test_resume_merges_avg(spark):
    # avg rides sum/count partials in the open bucket, so resumed runs
    # merge it exactly (a bare average is not a mergeable aggregate)
    from logstash_filter_aggregate_spark.config import AggSpec, CorrelationRule, PipelineConfig

    cfg = PipelineConfig(
        task_id="%{taskid}",
        rules=(
            CorrelationRule(
                "sql", "logger = 'SQL'",
                aggs=(AggSpec("avg_dur", "avg", "duration"), AggSpec("n", "count")),
            ),
        ),
        timeout=3600.0,
    )
    rows = [
        ("c1", 0, "user", "INFO - t - SQL - q - 10", "none", T0),
        ("c1", 1, "user", "INFO - t - SQL - q - 20", "none", T0 + dt.timedelta(seconds=30)),
        ("c1", 2, "user", "INFO - t - SQL - q - 60", "none", T0 + dt.timedelta(seconds=90)),
    ]
    full = spark.createDataFrame(rows, _SCHEMA)
    c1 = full.where(F.col("ts") < F.lit(SPLIT))
    c2 = full.where(F.col("ts") >= F.lit(SPLIT))
    ref = run_pipeline(spark, full, cfg)
    a = run_pipeline(spark, c1, cfg)
    b = run_pipeline(spark, c2, cfg, open_maps=a.open.localCheckpoint())
    got = b.open.select("task_id", "avg_dur", "n").collect()
    exp = ref.open.select("task_id", "avg_dur", "n").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in exp] == [("t", 30.0, 3)]


def test_resume_roundtrips_through_parquet(spark, tmp_path):
    # the real persistence path: run A's open bucket lands in a parquet
    # sink, run B reads it back from disk and seeds from it
    cfg = example3_config(timeout=100.0, inactivity_timeout=100.0)
    rows = [
        ("c1", 0, "user", "INFO - t - Clicked One", "none", T0),
        ("c1", 1, "user", "INFO - t - Clicked Two", "none", T0 + dt.timedelta(seconds=50)),
        ("c1", 2, "user", "INFO - t - Clicked Three", "none", T0 + dt.timedelta(seconds=90)),
        ("c1", 3, "user", "INFO - t - Clicked Four", "none", T0 + dt.timedelta(seconds=120)),
    ]
    full = spark.createDataFrame(rows, _SCHEMA)
    c1 = full.where(F.col("ts") < F.lit(SPLIT))
    c2 = full.where(F.col("ts") >= F.lit(SPLIT))
    ref = run_pipeline(spark, full, cfg)
    a = run_pipeline(spark, c1, cfg)
    p = str(tmp_path / "open_a")
    a.open.write.mode("overwrite").parquet(p)
    b = run_pipeline(spark, c2, cfg, open_maps=spark.read.parquet(p))
    assert sorted(_fp(a.timeout) + _fp(b.timeout)) == _fp(ref.timeout)
    assert _fp(b.open) == _fp(ref.open)

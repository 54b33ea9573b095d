"""Physical-plan regression tests: the scale properties the engine
claims (single event-stream exchange, parquet column pruning, filter
pushdown, broadcast dimension joins) asserted on the actual Catalyst
plans, so a refactor that silently adds a shuffle or widens a scan
fails CI instead of surfacing at 100x the data.
"""

import pytest
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.operators import dedup
from logstash_filter_aggregate_spark.plans.pipeline import (
    example1_config,
    example3_config,
    example5_config,
    run_pipeline,
)
from logstash_filter_aggregate_spark.sources.transcripts import (
    generate_transcripts,
    role_dim,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def transcripts_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plan_in") / "t.parquet")
    generate_transcripts(spark, n_convs=24, hot_convs=0).write.mode("overwrite").parquet(p)
    return p


@pytest.mark.parametrize(
    "cfg_fn",
    [
        lambda: example5_config(timeout=600.0, inactivity_timeout=300.0),
        lambda: example1_config(timeout=3600.0),  # guards add more windows — same key
    ],
)
def test_correlation_stage_single_task_exchange(spark, transcripts_path, cfg_fn):
    # the whole sessionize/guard/aggregate stage must share ONE hash
    # exchange on the task key: every window and the session groupBy are
    # co-partitioned (the claim BENCH/BASELINE.md's scaling rests on)
    t = spark.read.parquet(transcripts_path)
    out = run_pipeline(spark, t, cfg_fn())
    plan = _plan(out.sessions)
    n_task_exchanges = plan.count("Exchange hashpartitioning(_task_id")
    assert n_task_exchanges == 1, plan


def test_correlation_scan_prunes_unused_columns(spark, transcripts_path):
    # the correlation branch needs (conv_id, turn_idx, ts, text) — role
    # and tool must be pruned out of the parquet read by Catalyst
    t = spark.read.parquet(transcripts_path)
    out = run_pipeline(spark, t, example5_config(timeout=600.0, inactivity_timeout=300.0))
    plan = _plan(out.sessions)
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, plan
    for ln in scan_lines:
        schema = ln.split("ReadSchema:", 1)[1]
        assert "role" not in schema and "tool" not in schema, ln


def test_filter_pushdown_reaches_parquet(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where("doc_id < 80")
    plan = _plan(dedup.exact_dedup(docs))
    assert "PushedFilters: [" in plan
    assert "LessThan(doc_id,80)" in plan, plan


def test_dim_join_broadcasts(spark, transcripts_path):
    t = spark.read.parquet(transcripts_path)
    out = run_pipeline(
        spark, t, example1_config(timeout=3600.0), dims={"role": role_dim(spark)}
    )
    plan = _plan(out.passthrough)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_guard_gated_passthrough_plan_shapes(spark, transcripts_path):
    # Guard-gated configs (example1's update rule, cancel rules): the
    # single-consumer passthrough reads a lazily CHECKPOINTED classified
    # stream shared by the guard-resolution build side and the main
    # stage (passthrough_shared_subtree) — the job parses the input
    # exactly once; the round-3 shape planned an independent second
    # correlation subtree as the broadcast build side, re-running
    # scan+parse and doubling the job cost.
    from logstash_filter_aggregate_spark.config import CorrelationRule, PipelineConfig

    t = spark.read.parquet(transcripts_path)
    tagged_plan = _plan(
        run_pipeline(spark, t, example1_config(timeout=3600.0)).passthrough
    )
    assert "SortMergeJoin" not in tagged_plan, tagged_plan
    assert "BroadcastHashJoin" in tagged_plan, tagged_plan
    # no parquet scan anywhere: every leg reads the checkpointed blocks
    assert "Scan parquet" not in tagged_plan, tagged_plan
    assert tagged_plan.count("Scan ExistingRDD") >= 2, tagged_plan

    cancel_cfg = PipelineConfig(
        task_id="%{taskid}",
        rules=(
            CorrelationRule("start", "logger = 'TASK_START'", map_action="create"),
            CorrelationRule("err", "err_tool is not null", map_action="update", cancel=True),
        ),
        timeout=3600.0,
    )
    # cancellation joins per-row inclusion (whatever join the planner
    # picks), but both sides still read the one checkpointed stream
    cancel_plan = _plan(run_pipeline(spark, t, cancel_cfg).passthrough)
    assert "Join" in cancel_plan and "Window" in cancel_plan, cancel_plan
    assert "Scan parquet" not in cancel_plan, cancel_plan

    # ungated configs plan no join and no window at all on the passthrough
    plain_plan = _plan(
        run_pipeline(spark, t, example3_config(timeout=600.0)).passthrough
    )
    assert "Join" not in plain_plan, plain_plan
    assert "Window" not in plain_plan, plain_plan


def test_narrowck_passthrough_shape_parity(spark, transcripts_path, monkeypatch):
    # SPARK_GRAFT_PT_SHAPE=narrowck: the shared-subtree checkpoint drops
    # the raw text column and rejoins it from the raw scan by row key —
    # measured a wash vs the default full-width checkpoint (docstring),
    # kept as a disk-vs-network tradeoff knob. Same rows, same columns,
    # same order of columns; the checkpoint must NOT carry text (the
    # rejoin scan is the only parquet leg allowed to).
    from logstash_filter_aggregate_spark.config import CorrelationRule, PipelineConfig

    t = spark.read.parquet(transcripts_path)
    base = run_pipeline(spark, t, example1_config(timeout=3600.0)).passthrough
    monkeypatch.setenv("SPARK_GRAFT_PT_SHAPE", "narrowck")
    narrow = run_pipeline(spark, t, example1_config(timeout=3600.0)).passthrough
    assert narrow.columns == base.columns
    # the rejoin leg is the ONLY parquet scan in the narrow plan, and it
    # reads just the row key + text (everything else rides the checkpoint)
    nplan = _plan(narrow)
    scan_lines = [ln for ln in nplan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, nplan
    for ln in scan_lines:
        schema = ln.split("ReadSchema:", 1)[1]
        assert "text" in schema and "role" not in schema, ln
    key = ["conv_id", "turn_idx"]
    sel = key + [F.to_json("tags").alias("tags"), "text"]
    a = {tuple(r) for r in base.select(*sel).collect()}
    b = {tuple(r) for r in narrow.select(*sel).collect()}
    assert a == b

    # gated-cancel delivery under narrowck too
    cancel_cfg = PipelineConfig(
        task_id="%{taskid}",
        rules=(
            CorrelationRule("start", "logger = 'TASK_START'", map_action="create"),
            CorrelationRule("err", "err_tool is not null", map_action="update", cancel=True),
        ),
        timeout=3600.0,
    )
    narrow_c = run_pipeline(spark, t, cancel_cfg).passthrough
    monkeypatch.delenv("SPARK_GRAFT_PT_SHAPE")
    base_c = run_pipeline(spark, t, cancel_cfg).passthrough
    assert narrow_c.columns == base_c.columns
    ac = {tuple(r) for r in base_c.select(*sel).collect()}
    bc = {tuple(r) for r in narrow_c.select(*sel).collect()}
    assert ac == bc


def test_guard_gated_cached_job_set_runs_correlation_once(spark, transcripts_path):
    # Multi-bucket jobs (cache_sessions=True): the narrow correlated
    # frame is persisted, so the correlation stage materializes ONCE
    # across the whole job set — the passthrough then stays scan-shaped,
    # broadcasting the (persisted) exception-key set: one parquet scan,
    # no Window, the build side an in-memory read.
    from logstash_filter_aggregate_spark.plans.pipeline import release_pipeline_caches

    t = spark.read.parquet(transcripts_path)
    out = run_pipeline(spark, t, example1_config(timeout=3600.0), cache_sessions=True)
    try:
        out.sessions.count()  # materializes the persisted correlation once
        pt_plan = _plan(out.passthrough)
        assert "BroadcastHashJoin" in pt_plan, pt_plan
        assert "InMemoryTableScan" in pt_plan, pt_plan
        # the stream side (everything before the in-memory build side) is
        # scan-shaped: one parquet scan, no correlation windows —
        # InMemoryTableScan's printed CACHED plan repeats the correlation
        # subtree's scans, so only the prefix is the live stream plan
        stream_side = pt_plan.partition("InMemoryTableScan")[0]
        assert stream_side.count("Scan parquet") == 1, pt_plan
        assert "Window" not in stream_side, pt_plan
        # the sessions aggregation reads the same persisted frame
        sess_plan = _plan(out.sessions)
        assert "InMemoryTableScan" in sess_plan, sess_plan
    finally:
        release_pipeline_caches()


def test_no_cartesian_or_nested_loop_in_pipeline(spark, transcripts_path):
    # the watermark scalar rides a broadcast nested loop of exactly one
    # row; nothing else may cross-join
    t = spark.read.parquet(transcripts_path)
    out = run_pipeline(spark, t, example5_config(timeout=600.0, inactivity_timeout=300.0))
    plan = _plan(out.timeout)
    assert "CartesianProduct" not in plan, plan


def test_minhash_single_input_scan(spark):
    # candidate generation via explode+groupBy scans the documents table
    # ONCE (a self-join formulation would scan and re-hash it twice)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _optimized(dedup.minhash_lsh_candidates(docs, k=3, num_hashes=16, bands=8))
    assert plan.count("Relation [") == 1, plan


def test_push_previous_exact_has_no_global_window(spark):
    # the exact interleaved mode must compute its global index with the
    # two-pass ranking, never a partition-less window: every Window
    # operator in the plan must be partitioned by the task key
    from __spark_entry__ import _o16_push_previous_interleaved

    df = _o16_push_previous_interleaved(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    for ln in plan.splitlines():
        if ln.strip().startswith(("Window ", "+- Window", ":- Window")) or "RunningWindowFunction" in ln:
            assert "_task_id" in ln, ln


def test_bucketed_table_elides_task_exchange(spark, tmp_path):
    # a table bucketed by the task-id column must run the whole
    # correlation stage with ZERO event-stream exchange: the scan's
    # HashPartitioning propagates through the narrowed stream because
    # narrow_for_correlation aliases the raw attribute for single-field
    # task ids. Results must equal the plain-parquet run exactly.
    from logstash_filter_aggregate_spark.config import AggSpec, CorrelationRule, PipelineConfig
    from logstash_filter_aggregate_spark.plans.pipeline import run_pipeline
    from logstash_filter_aggregate_spark.sources.transcripts import (
        generate_transcripts,
        write_bucketed_table,
    )

    t = generate_transcripts(spark, n_convs=40)
    spark.sql("DROP TABLE IF EXISTS bt_transcripts")
    write_bucketed_table(
        t, "bt_transcripts", bucket_col="conv_id", buckets=8,
        path=str(tmp_path / "bt_transcripts"),
    )
    bt = spark.table("bt_transcripts")

    cfg = PipelineConfig(
        task_id="%{conv_id}",
        rules=(
            CorrelationRule(
                "sql", "logger = 'SQL'",
                aggs=(AggSpec("total", "sum", "coalesce(duration, 0)"),),
            ),
        ),
        timeout=1e9, inactivity_timeout=600.0,
        push_map_as_event_on_timeout=True,
    )
    out = run_pipeline(spark, bt, cfg)
    plan = out.sessions._jdf.queryExecution().executedPlan().toString()
    # only the tiny session-level routing window may exchange; the event
    # stream itself must ride the bucket partitioning
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex <= 1, plan[:2000]

    plain = run_pipeline(spark, t, cfg)
    key = lambda r: (r.task_id, r.nevents, int(r.total or 0))  # noqa: E731
    assert sorted(map(key, out.sessions.collect())) == sorted(
        map(key, plain.sessions.collect())
    )

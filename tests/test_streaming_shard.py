"""Shard-keyed streaming state (streaming/shard.py) vs the per-key tier.

The shard tier multiplexes every live task's state cell into one
state-store row per ``hash(task_id) % shards`` group (state
amortization for high-cardinality task ids — see the module docstring
for the measured per-key floor). These tests pin output equality with
the per-key tier / batch engine across every sink kind, carried state
across micro-batches, and the watermark-eviction path that replaces
per-key timers.
"""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.config import AggSpec, CorrelationRule, PipelineConfig
from logstash_filter_aggregate_spark.plans.pipeline import example1_config
from logstash_filter_aggregate_spark.sources.transcripts import generate_transcripts
from tests.conftest import T0, make_transcript


def _run_stream(spark, path, df_fn, name, max_files=None):
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    out = df_fn(reader.parquet(path))
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(300)
    return spark.table(name)


def _canon_correlate(df):
    """Sink rows up to JSON numeric formatting: the shard tier's chunk
    spans many tasks, so pandas dtype upcasts can render a sum as 0.0
    where the per-key chunk rendered 0 — numerically identical maps."""
    def _n(v):
        return float(v) if isinstance(v, (int, float)) and not isinstance(v, bool) else v

    return sorted(
        (r.task_id, r.sink, r.creation_ts, r.lastevent_ts, r.nevents,
         tuple(sorted((k, json.dumps(_n(v), default=str))
                      for k, v in json.loads(r.map_json).items())))
        for r in df.collect()
    )


def test_shard_correlate_equals_per_key_multibatch(spark, tmp_path):
    # full-lifecycle equality on a generated corpus driven through
    # several micro-batches (carried cells, expiry-on-arrival, completes)
    from logstash_filter_aggregate_spark.streaming.stream import streaming_correlate

    p = str(tmp_path / "in")
    generate_transcripts(spark, n_convs=40, hot_convs=2).repartition(5).write.parquet(p)
    cfg = example1_config(timeout=3600.0)
    # hash-partitioned files replayed one per batch arrive out of TIME
    # order; the default 10-min watermark would fire timers against that
    # replay artifact nondeterministically (file listing order), which
    # can evict every map before its end event arrives. A watermark
    # beyond the corpus span keeps mid-replay timers quiet in BOTH modes
    # so the equality (and non-emptiness) is deterministic.
    wm = "30 days"
    per_key = _canon_correlate(_run_stream(
        spark, p, lambda s: streaming_correlate(s, cfg, watermark=wm),
        "shard_co_a", max_files=1,
    ))
    sharded = _canon_correlate(_run_stream(
        spark, p, lambda s: streaming_correlate(s, cfg, watermark=wm, shards=7),
        "shard_co_b", max_files=1,
    ))
    assert per_key and per_key == sharded


def test_shard_correlate_custom_timeouts(spark, tmp_path):
    # O17 through the shard tier: custom_timeout=0 -> inline eviction,
    # >0 override -> expiry-on-arrival push (same scenario as the
    # per-key test_streaming_custom_timeouts_match_reference)
    from logstash_filter_aggregate_spark.streaming.stream import streaming_correlate

    cfg = PipelineConfig(
        task_id="%{taskid}",
        rules=(
            CorrelationRule(
                "err", "err_code is not null",
                aggs=(AggSpec("errors", "count"),), custom_timeout="0",
            ),
            CorrelationRule(
                "click", "click_target is not null",
                aggs=(AggSpec("clicks", "count"),), custom_timeout="10",
            ),
        ),
        timeout=600.0,
        push_map_as_event_on_timeout=True,
    )
    rows = [
        ("c1", 0, "user", "INFO - t - Clicked One", "none", T0),
        ("c1", 1, "tool", "ERROR - t - TOOL - http - E503", "http", T0 + dt.timedelta(seconds=1)),
        ("c2", 0, "user", "INFO - u - Clicked One", "none", T0),
        ("c2", 1, "user", "INFO - u - Clicked Two", "none", T0 + dt.timedelta(seconds=50)),
        ("c2", 2, "user", "INFO - u - Clicked Three", "none", T0 + dt.timedelta(seconds=55)),
    ]
    p = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).write.parquet(p)
    got = _run_stream(
        spark, p, lambda s: streaming_correlate(s, cfg, shards=3), "shard_custom"
    )
    by = {(r.task_id, r.sink): r for r in got.collect()}
    inline = by[("t", "inline")]
    assert inline.nevents == 2
    assert json.loads(inline.map_json) == {"clicks": 1, "errors": 1}
    assert json.loads(by[("u", "timeout")].map_json) == {"clicks": 1}
    assert ("u", "inline") not in by and ("u", "completed") not in by


def test_shard_gated_emissions_match_per_key(spark, tmp_path):
    # O18 emit rows through the shard tier: fire exactly where the code
    # runs (update-before-create and duplicate-create suppressed), with
    # globally-numbered sessions feeding the per-row running count
    from logstash_filter_aggregate_spark.streaming.stream import streaming_correlate

    cfg = PipelineConfig(
        task_id="%{taskid}",
        rules=(
            CorrelationRule(
                "start", "logger = 'TASK_START'", map_action="create",
                emit={"s": "taskid"},
            ),
            CorrelationRule(
                "err", "err_tool is not null", map_action="update",
                emit={"uid": "taskid", "code": "err_code"},
            ),
        ),
        timeout=1e9,
    )
    rows = [
        (0, "ERROR - u1 - TOOL - http - E503", 0),   # before start: no emit
        (1, "INFO - u1 - TASK_START - start", 1),    # creates -> start emits
        (2, "INFO - u1 - TASK_START - start", 2),    # duplicate: no emit
        (3, "ERROR - u1 - TOOL - http - E504", 3),   # included: emits
        (4, "ERROR - u2 - TOOL - http - E700", 4),   # second task, orphan: no emit
        (5, "INFO - u2 - TASK_START - start", 5),    # creates -> start emits
        (6, "ERROR - u2 - TOOL - http - E701", 6),   # included: emits
    ]
    p = str(tmp_path / "in")
    make_transcript(spark, rows).write.parquet(p)

    def run(shards, name):
        got = _run_stream(
            spark, p,
            lambda s: streaming_correlate(
                s.withColumn("ts", F.col("ts").cast("timestamp")), cfg, shards=shards
            ),
            name,
        )
        rows_ = [
            (r.task_id, r.nevents, tuple(sorted(json.loads(r.map_json).items())))
            for r in got.where("sink = 'emit'").collect()
        ]
        return sorted(rows_)

    per_key = run(None, "shard_emit_a")
    sharded = run(2, "shard_emit_b")
    assert per_key == sharded
    assert len(per_key) == 4  # 2 start emits + E504 + E701


def test_shard_eviction_pushes_timeout_on_shardmates_batch(spark, tmp_path):
    # the shard tier replaces per-key timers with watermark eviction:
    # an expired task's timeout row is pushed when ITS SHARD is next
    # invoked — here by a different task hashing into the same shard
    # (shards=1 forces the collision)
    from logstash_filter_aggregate_spark.streaming.stream import streaming_correlate

    cfg = PipelineConfig(
        task_id="%{taskid}",
        rules=(CorrelationRule("click", "click_target is not null",
                               aggs=(AggSpec("clicks", "count"),)),),
        timeout=600.0,
        push_map_as_event_on_timeout=True,
    )
    p = str(tmp_path / "in")
    sch = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    batches = [
        [("a1", 0, "user", "INFO - A - Clicked One", "none", T0),
         ("a1", 1, "user", "INFO - A - Clicked Two", "none", T0 + dt.timedelta(seconds=1))],
        [("c1", 0, "user", "INFO - C - Clicked One", "none", T0 + dt.timedelta(seconds=5000))],
        [("d1", 0, "user", "INFO - D - Clicked One", "none", T0 + dt.timedelta(seconds=6000))],
    ]
    for b in batches:
        spark.createDataFrame(b, sch).repartition(1).write.mode("append").parquet(p)

    got = _run_stream(
        spark, p,
        lambda s: streaming_correlate(s, cfg, watermark="10 seconds", shards=1),
        "shard_evict", max_files=1,
    )
    pushed = {(r.task_id, r.sink): r for r in got.collect()}
    # A expired mid-stream (watermark ~4990 after C's batch) and was
    # evicted by a later shard invocation carrying OTHER tasks' data;
    # C expired at the final watermark (~5990 >= 5600) via the shard
    # timer (hasTimedOut path); D (expiry 6600) stays open
    assert set(pushed) == {("A", "timeout"), ("C", "timeout")}
    a = pushed[("A", "timeout")]
    assert a.nevents == 2 and json.loads(a.map_json) == {"clicks": 2}
    assert json.loads(pushed[("C", "timeout")].map_json) == {"clicks": 1}


def test_shard_passthrough_fuzz_carried_state(spark, tmp_path):
    # randomized guard-gated streams through the SHARD passthrough in two
    # micro-batches (cells cross the restart inside multiplexed state
    # rows), verified against the independent per-row reference simulator
    import random
    import warnings

    from logstash_filter_aggregate_spark.config import GuardedWindowModeWarning
    from logstash_filter_aggregate_spark.streaming.stream import streaming_passthrough
    from tests.test_fuzz_reference import (
        _LINES,
        _pt_shapes,
        _scenario_rows,
        simulate_passthrough,
    )

    rng = random.Random(20260824)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    shape, (cfg_kw, sim_rules, kinds) = next(iter(_pt_shapes().items()))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", GuardedWindowModeWarning)
        cfg = PipelineConfig(task_id="%{taskid}", **cfg_kw)
    streams = {f"sh{i:02d}": _scenario_rows(rng, kinds, n_max=25) for i in range(8)}
    data, wm = [], 0.0
    for tid, rows in streams.items():
        for j, (kind, ts, val) in enumerate(rows):
            data.append((tid, j, "user", _LINES[kind].format(tid=tid, val=val),
                         "none", T0 + dt.timedelta(seconds=ts)))
            wm = max(wm, ts)
    split = T0 + dt.timedelta(seconds=wm * 0.5)
    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    df = spark.createDataFrame(data, schema)
    df.where(F.col("ts") < F.lit(split)).repartition(2).write.parquet(src)

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_passthrough(stream, cfg, watermark="100000 seconds", shards=5)
            .writeStream.format("parquet")
            .option("path", out_dir).option("checkpointLocation", cp)
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(300)

    run_once()
    df.where(F.col("ts") >= F.lit(split)).repartition(2).write.mode("append").parquet(src)
    run_once()

    got = {
        (r.conv_id, r.turn_idx): tuple(sorted(r.tags or []))
        for r in spark.read.parquet(out_dir).select("conv_id", "turn_idx", "tags").collect()
    }
    n_exp = 0
    for tid, rows in streams.items():
        for idx, kept, tagged in simulate_passthrough(
            rows, sim_rules, cfg.timeout, cfg.effective_inactivity_timeout
        ):
            if not kept:
                assert (tid, idx) not in got, (tid, idx)
                continue
            n_exp += 1
            want = ("_aggregateexception",) if tagged else ()
            assert got.get((tid, idx)) == want, (tid, idx, got.get((tid, idx)), want)
    assert len(got) == n_exp


def test_cell_codec_roundtrip_fuzz():
    # property fuzz for the binary cell-set codec (no Spark): arbitrary
    # task ids (unicode), finite clocks, optional maps/overrides must
    # survive encode->decode exactly; json-codec blobs decode too
    import json as _json

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from logstash_filter_aggregate_spark.streaming.shard import (
        _decode_cells,
        _encode_cells,
    )

    finite = st.floats(allow_nan=False, allow_infinity=False,
                       min_value=-1e15, max_value=1e15)
    payload = st.dictionaries(
        st.text(min_size=1, max_size=8),
        st.one_of(st.integers(-2**40, 2**40), finite,
                  st.text(max_size=12),
                  st.lists(st.integers(-100, 100), max_size=4)),
        max_size=4,
    )
    opt_clock = st.one_of(st.none(), st.floats(min_value=1e-3, max_value=1e9))
    cell = st.tuples(
        finite, finite, st.integers(0, 2**40),
        st.one_of(st.none(), payload),
        opt_clock, opt_clock,
        opt_clock, opt_clock,       # wall_cap / wall_last (proc mode)
    ).map(list)
    cells_st = st.dictionaries(st.text(min_size=1, max_size=64), cell, max_size=32)

    @settings(max_examples=300, deadline=None)
    @given(cells_st)
    def check(cells):
        # empty maps normalize to None on encode (c[_M] falsy) — mirror
        # that in the expectation
        expect = {
            t: [c[0], c[1], c[2], (c[3] or None), *c[4:]]
            for t, c in cells.items()
        }
        assert _decode_cells(_encode_cells(cells)) == expect
        # json-codec blobs (the A/B switch) decode through the same entry
        assert _decode_cells(_json.dumps(cells, default=str).encode()) == cells
        # r6-interim SGC1 blobs (5-wide numeric block) decode with None
        # wall fields
        legacy = {t: c[:6] for t, c in cells.items()}
        import struct as _struct

        import numpy as _np

        n = len(legacy)
        num = _np.empty((n, 5), dtype=_np.float64)
        tblobs = []
        maps = {}
        for i, (t, c) in enumerate(legacy.items()):
            tblobs.append(t.encode())
            num[i] = [c[0], c[1], c[2],
                      _np.nan if c[4] is None else c[4],
                      _np.nan if c[5] is None else c[5]]
            if c[3]:
                maps[i] = c[3]
        lens = _np.fromiter((len(b) for b in tblobs), dtype=_np.int32, count=n)
        mb = _json.dumps(maps).encode() if maps else b""
        blob = b"".join((b"SGC1", _struct.pack("<QQ", n, len(mb)),
                         lens.tobytes(), num.tobytes(), b"".join(tblobs), mb))
        got = _decode_cells(blob)
        assert got == {
            t: [c[0], c[1], c[2], (c[3] or None), c[4], c[5], None, None]
            for t, c in legacy.items()
        }

    check()

"""Code side-effects gate on the map-action guard (VERDICT r2 item 1).

The reference runs the rule's ``code`` — and therefore ``new_event_block``
emissions, exception tagging and ``event.cancel()`` — only AFTER the
map-action guard passes: an ``update`` with no live map returns at
``aggregate.rb:203`` and a duplicate ``create`` at ``:216``, both before
the code at ``:226`` (the no-op behaviors pinned by spec:52-68 and
spec:72-84). These tests pin that emissions / tags / cancels are
suppressed exactly where the reference suppresses the code, on both the
window path and the prereduce (skew) path.
"""

from logstash_filter_aggregate_spark.config import AggSpec, CorrelationRule, PipelineConfig
from logstash_filter_aggregate_spark.plans.pipeline import run_pipeline
from tests.conftest import make_transcript


def _cfg() -> PipelineConfig:
    return PipelineConfig(
        task_id="%{taskid}",
        rules=(
            # create rule with an emission: fires once per actual map
            # creation, NOT on duplicate starts (spec:52-68)
            CorrelationRule(
                "start", "logger = 'TASK_START'", map_action="create",
                emit={"s": "taskid"},
            ),
            # update-guarded rule with emission + cancel + required agg:
            # all three side-effects need a live map (spec:72-84)
            CorrelationRule(
                "err", "err_tool is not null", map_action="update", cancel=True,
                emit={"uid": "taskid", "code": "err_code"},
                aggs=(AggSpec("esum", "sum", "CASE WHEN err_code < 600 THEN err_code END", required=True),),
            ),
            # update-guarded required agg WITHOUT cancel so the
            # _aggregateexception tag stays visible in the passthrough
            CorrelationRule(
                "click", "click_target is not null", map_action="update",
                aggs=(AggSpec("v", "sum", "CASE WHEN click_target <> 'Bad' THEN 1 END", required=True),),
            ),
        ),
        timeout=1e9,
    )


_ROWS = [
    (0, "ERROR - u1 - TOOL - http - E503", 0),   # err BEFORE start: no-op
    (1, "INFO - u1 - Clicked Bad", 1),            # req-null but excluded: no tag
    (2, "INFO - u1 - TASK_START - start", 2),     # creates -> start emits
    (3, "INFO - u1 - TASK_START - start", 3),     # duplicate create: no emit
    (4, "ERROR - u1 - TOOL - http - E504", 4),    # included: emit + cancel
    (5, "ERROR - u1 - TOOL - http - E700", 5),    # included: emit + cancel (+tag, but cancelled)
    (6, "INFO - u1 - Clicked Bad", 6),            # included req-null: tagged
    (7, "INFO - u1 - Clicked One", 7),            # included, req present
]


def _check(out):
    inline = out.inline.collect()
    # err emissions: only the two errors AFTER the map was created
    assert sorted((r.uid, r.code) for r in inline if r.uid is not None) == [
        ("u1", 504), ("u1", 700),
    ]
    # start emission: exactly ONE (the duplicate create at t3 is a no-op)
    assert [r.s for r in inline if r.s is not None] == ["u1"]

    pt = {r.turn_idx: r for r in out.passthrough.collect()}
    # cancelled: only the err rows whose code ran (t4, t5); the pre-start
    # err at t0 passes through untouched
    assert sorted(pt) == [0, 1, 2, 3, 6, 7]
    # exception tag: only the included required-null click (t6); the
    # excluded one at t1 is a guard no-op
    assert pt[6].tags == ["_aggregateexception"]
    for i in (0, 1, 2, 3, 7):
        assert pt[i].tags == []


def test_guard_gated_side_effects_window_path(spark):
    out = run_pipeline(spark, make_transcript(spark, _ROWS), _cfg())
    _check(out)


def test_guard_gated_side_effects_prereduce_path(spark):
    # the prereduce (skew) path resolves inclusion on the classified
    # stream (skew.guard_inclusion_frame) — same observable behavior
    out = run_pipeline(
        spark, make_transcript(spark, _ROWS), _cfg(), prereduce_s=3600.0
    )
    _check(out)


def test_fuzz_gated_emissions_match_reference_simulator(spark):
    # randomized guards_end streams with an emitting update rule: the
    # engine's inline emissions must equal exactly the rows whose
    # codeblock the reference simulator runs (guard passed, map alive
    # after expiry-on-arrival). Runs in exact_age_cap mode, so this also
    # drives the vectorized guarded scan under mixed actions.
    import datetime as dt
    import random

    from logstash_filter_aggregate_spark.config import AggSpec
    from tests.conftest import T0
    from tests.test_fuzz_reference import _LINES, _scenario_rows

    cfg = PipelineConfig(
        task_id="%{taskid}",
        exact_age_cap=True,
        rules=(
            CorrelationRule("start", "logger = 'TASK_START'", map_action="create"),
            CorrelationRule(
                "sql", "logger = 'SQL'", map_action="update",
                aggs=(AggSpec("val_sum", "sum", "coalesce(duration, 0)"),),
                emit={"uid": "taskid", "v": "duration"},
            ),
            CorrelationRule("end", "logger = 'TASK_END'", map_action="update", end_of_task=True),
        ),
        timeout=250.0,
        inactivity_timeout=250.0,
        push_map_as_event_on_timeout=True,
    )

    def emitted_rows(rows):
        # the simulator's state walk, recording each sql row whose code ran
        st = None
        out = []
        for kind, ts, val in rows:
            if kind not in ("start", "sql", "end"):
                continue
            if st is not None and (
                ts - st["creation"] > 250.0 or ts - st["last"] > 250.0
            ):
                st = None
            if st is None:
                if kind in ("sql", "end"):
                    continue  # update with no map: no code (aggregate.rb:203)
                st = dict(creation=ts, last=ts)
            elif kind == "start":
                continue  # duplicate create: no code (aggregate.rb:216)
            st["last"] = ts
            if kind == "sql":
                out.append(val)
            if kind == "end":
                st = None
        return sorted(out)

    rng = random.Random(20260817)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    streams = {
        f"ge{i:02d}": _scenario_rows(rng, ["start", "sql", "end"], n_max=40)
        for i in range(25)
    }
    data = []
    for tid, rows in streams.items():
        for j, (kind, ts, val) in enumerate(rows):
            data.append((tid, j, "user", _LINES[kind].format(tid=tid, val=val),
                         "none", T0 + dt.timedelta(seconds=ts)))
    df = spark.createDataFrame(data, schema).repartition(5)
    out = run_pipeline(spark, df, cfg)
    got: dict[str, list] = {tid: [] for tid in streams}
    for r in out.inline.collect():
        got[r.uid].append(r.v)
    n_checked = 0
    for tid, rows in streams.items():
        exp = emitted_rows(rows)
        assert sorted(got[tid]) == exp, (tid, rows, sorted(got[tid]), exp)
        n_checked += len(exp)
    assert n_checked > 50  # the fuzz actually exercised emissions


def test_ungated_rules_unchanged(spark):
    # a create_or_update emit rule fires for every matched row with a
    # resolved task id — the pre-existing (ungated) behavior
    cfg = PipelineConfig(
        task_id="%{taskid}",
        rules=(
            CorrelationRule(
                "err", "err_tool is not null", cancel=True,
                emit={"uid": "taskid", "code": "err_code"},
            ),
        ),
        timeout=1e9,
    )
    rows = [
        (0, "ERROR - u1 - TOOL - http - E503", 0),
        (1, "ERROR - u1 - TOOL - http - E504", 1),
        (2, "INFO - u1 - Clicked One", 2),  # unmatched by any rule
    ]
    out = run_pipeline(spark, make_transcript(spark, rows), cfg)
    assert sorted((r.uid, r.code) for r in out.inline.collect()) == [
        ("u1", 503), ("u1", 504),
    ]
    assert [r.turn_idx for r in out.passthrough.collect()] == [2]

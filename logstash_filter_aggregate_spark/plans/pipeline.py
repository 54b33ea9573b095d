"""End-to-end pipeline composition (SURVEY.md §3.6):

``parse (U1) -> enrich (U4) -> classify (U2) -> sessionize (O8-O12) ->
guards (O3) -> aggregate (O4-O6) -> route (O13-O16, U5)`` plus the
passthrough event stream (tags O19, cancel U3) and inline emissions
(O18). The logical plan is declared once; Catalyst/AQE pick the
physical strategy. Two shuffles total on the hot path: the
``_task_id`` window exchange (reused by every window and the groupBy,
which are co-partitioned) and the small session-level routing window.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.config import (
    AggSpec,
    CorrelationRule,
    PipelineConfig,
)
from logstash_filter_aggregate_spark.functions.grok import (
    CompiledGrok,
    apply_grok_jvm,
    apply_grok_pandas,
    compile_grok,
)
from logstash_filter_aggregate_spark.operators.classify import classify
from logstash_filter_aggregate_spark.operators.correlate import (
    RoutedSessions,
    aggregate_sessions,
    apply_guards,
    route_sessions,
)
from logstash_filter_aggregate_spark.operators.sessionize import sessionize


@dataclass
class PipelineOutputs:
    completed: DataFrame
    timeout: DataFrame
    inline: DataFrame
    open: DataFrame
    passthrough: DataFrame
    sessions: DataFrame

    def as_dict(self) -> dict[str, DataFrame]:
        return {
            "completed": self.completed,
            "timeout": self.timeout,
            "inline": self.inline,
            "open": self.open,
            "passthrough": self.passthrough,
            "sessions": self.sessions,
        }


# The grok dictionary for the canonical transcript line formats
# (FIXTURES.md §1; reference patterns docs/index.asciidoc:52,165).
DEFAULT_GROKS: list[tuple[str, str]] = [
    # specific before generic (grok break_on_match: first match wins)
    ("error", r"%{LOGLEVEL:loglevel} - %{NOTSPACE:taskid} - TOOL - %{WORD:err_tool} - E%{INT:err_code:int}"),
    ("click", r"%{LOGLEVEL:loglevel} - %{NOTSPACE:taskid} - Clicked %{WORD:click_target}"),
    ("task", r"%{LOGLEVEL:loglevel} - %{NOTSPACE:taskid} - %{NOTSPACE:logger} - %{WORD:label}( - %{INT:duration:int})?"),
]


def compile_groks(patterns: list[tuple[str, str]] | None = None) -> list[CompiledGrok]:
    return [compile_grok(n, p) for n, p in (patterns or DEFAULT_GROKS)]


def parse(df: DataFrame, groks: list[CompiledGrok] | None = None, backend: str = "jvm") -> DataFrame:
    groks = groks or compile_groks()
    if backend == "jvm":
        return apply_grok_jvm(df, "text", groks)
    if backend == "pandas":
        return apply_grok_pandas(df, "text", groks)
    raise ValueError(f"unknown parse backend {backend!r}")


def enrich(df: DataFrame, dims: dict[str, DataFrame] | None = None) -> DataFrame:
    """Broadcast dimension join (U4): dims keyed by their join column."""
    for key, dim in (dims or {}).items():
        df = df.join(F.broadcast(dim), on=key, how="left")
    return df


def _exception_flag(cfg: PipelineConfig) -> F.Column:
    """O19: a matched row whose required agg input is NULL — the
    reference's codeblock would raise and tag ``_aggregateexception``
    (``aggregate.rb:229-237``)."""
    flag = F.lit(False)
    for r in cfg.rules:
        req = [s for s in r.aggs if s.required and s.col]
        if not req:
            continue
        cond = F.col("_rule_id") == r.rule_id
        nulls = F.lit(False)
        for s in req:
            nulls = nulls | F.expr(s.col).isNull()
        flag = flag | (cond & nulls)
    return flag


def passthrough_stream(classified: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """The event stream continuing downstream (the reference yields every
    non-cancelled event, ``aggregate.rb:251-254``): original columns +
    accumulated tags; rows consumed by cancel rules dropped (U3,
    ``docs/index.asciidoc:235,244``)."""
    df = classified.where(~F.col("_cancel"))
    exc = _exception_flag(cfg)
    tags = F.col("parse_tags")
    tags = F.when(exc, F.array_union(tags, F.array(F.lit("_aggregateexception")))).otherwise(tags)
    df = df.withColumn("tags", tags)
    return df.drop(
        "_rule_id", "_task_id", "_end_flag", "_action", "_cancel",
        "_custom_timeout", "_custom_inactivity", "parse_tags",
    )


def inline_emissions(classified: DataFrame, cfg: PipelineConfig) -> DataFrame | None:
    """O18 (``new_event_block``, ``aggregate.rb:91,226``): each row matched
    by a rule with ``emit`` produces one derived event immediately."""
    outs: list[DataFrame] = []
    for r in cfg.rules:
        if not r.emit:
            continue
        rows = classified.where(F.col("_rule_id") == r.rule_id)
        outs.append(rows.select(*[F.expr(e).alias(n) for n, e in r.emit.items()]))
    if not outs:
        return None
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o, allowMissingColumns=True)
    return df


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: PipelineConfig,
    groks: list[CompiledGrok] | None = None,
    dims: dict[str, DataFrame] | None = None,
    parse_backend: str = "jvm",
    open_maps: DataFrame | None = None,
    prereduce_s: float | None = None,
    prereduce_assume_no_expiry: bool = False,
    cache_sessions: bool = False,
    pre_parsed: bool = False,
) -> PipelineOutputs:
    """``open_maps``: the previous run's ``open`` bucket — resumes the
    still-live maps (plans/resume.py, the aggregate_maps_path analog).

    ``prereduce_s``: hot-conversation skew handling (operators/skew.py):
    collapse correlation rows into per-(task, bucket) partial rows before
    the task-ordered window. Exact for gap splits when ``prereduce_s <=
    inactivity_timeout``; absolute-age splits quantize to bucket
    boundaries (opting in accepts that)."""
    from logstash_filter_aggregate_spark.plans.resume import inject_seeds

    # pre_parsed: the caller already ran parse() (run_multi shares one
    # parse across patterns — the parse stage is the most expensive one,
    # so M patterns must not pay it M times)
    parsed = transcripts if pre_parsed else parse(transcripts, groks, backend=parse_backend)
    parsed = enrich(parsed, dims)
    classified = classify(parsed, cfg)
    if prereduce_s is not None:
        from logstash_filter_aggregate_spark.operators.skew import prereduce

        correlated_in = prereduce(
            classified, cfg, bucket_s=prereduce_s, allow_age_approx=True,
            assume_no_expiry=prereduce_assume_no_expiry,
        )
    else:
        # narrow the correlation stream before the task-id exchange: the
        # shuffle/sort carry engine columns + pre-evaluated agg inputs
        # only, never raw text or unused captures
        from logstash_filter_aggregate_spark.operators.correlate import narrow_for_correlation

        correlated_in = narrow_for_correlation(classified, cfg)
    correlated_in = inject_seeds(correlated_in, open_maps, cfg)

    sessionized = sessionize(correlated_in, cfg)
    guarded = apply_guards(sessionized, cfg)
    sessions = aggregate_sessions(guarded, cfg)
    wm_value = None
    if cache_sessions:
        # when several buckets are materialized (routed sink writes), the
        # aggregated sessions are tiny relative to the event stream —
        # persist them so each bucket write doesn't recompute the windows,
        # and materialize the watermark scalar once (scan-only job) so the
        # bucket plans embed a literal instead of re-scanning the input
        sessions = sessions.persist()
        wm_value = transcripts.agg(F.max("ts")).first()[0]
    # watermark from the raw input: scan-only (ts column pruned down to
    # the parquet reader), so routing never recomputes the pipeline
    routed: RoutedSessions = route_sessions(
        sessions, cfg, watermark_df=transcripts, watermark_value=wm_value
    )

    inline = routed.inline
    emitted = inline_emissions(classified, cfg)
    if emitted is not None:
        inline = inline.unionByName(emitted, allowMissingColumns=True)

    return PipelineOutputs(
        completed=routed.completed,
        timeout=routed.timeout,
        inline=inline,
        open=routed.open,
        passthrough=passthrough_stream(classified, cfg),
        sessions=routed.sessions,
    )


# ---------------------------------------------------------------------------
# Canonical configs mirroring the reference's documented examples
# ---------------------------------------------------------------------------

def example1_config(**overrides) -> PipelineConfig:
    """Example #1 (docs/index.asciidoc:36-93; spec:86-133): start/update/end
    correlation summing sql duration. Start = map_action create; update/end
    = map_action update (the spec helper's canonical filters, spec:8-13)."""
    defaults = dict(
        task_id="%{taskid}",
        rules=(
            CorrelationRule(
                "start", "logger = 'TASK_START'", map_action="create",
                aggs=(AggSpec("sql_duration", "sum", "cast(0 as long)"),),
            ),
            CorrelationRule(
                "update", "logger = 'SQL'", map_action="update",
                aggs=(AggSpec("sql_duration", "sum", "duration", required=True),),
            ),
            CorrelationRule(
                "end", "logger = 'TASK_END'", map_action="update", end_of_task=True,
            ),
        ),
        timeout=120.0,
    )
    defaults.update(overrides)
    return PipelineConfig(**defaults)


def example2_config(**overrides) -> PipelineConfig:
    """Example #2 (docs/index.asciidoc:96-136): no start event; the update
    rule both creates and accumulates (||= init is sum's identity)."""
    defaults = dict(
        task_id="%{taskid}",
        rules=(
            CorrelationRule(
                "update", "logger = 'SQL'",
                aggs=(AggSpec("sql_duration", "sum", "duration"),),
            ),
            CorrelationRule("end", "logger = 'TASK_END'", end_of_task=True),
        ),
        timeout=120.0,
    )
    defaults.update(overrides)
    return PipelineConfig(**defaults)


def example3_config(**overrides) -> PipelineConfig:
    """Example #3 (docs/index.asciidoc:139-192; spec:197-206): no end event
    — click counting pushed on timeout with timeout_task_id_field, tags,
    and timeout_code."""
    defaults = dict(
        task_id="%{taskid}",
        rules=(
            CorrelationRule(
                "click", "click_target is not null",
                aggs=(AggSpec("clicks", "count"),),
            ),
        ),
        timeout=600.0,
        push_map_as_event_on_timeout=True,
        timeout_task_id_field="user_id",
        timeout_tags=("_aggregatetimeout",),
        timeout_code={"several_clicks": "clicks > 1"},
    )
    defaults.update(overrides)
    return PipelineConfig(**defaults)


def example4_config(**overrides) -> PipelineConfig:
    """Example #4 (docs/index.asciidoc:195-245; spec:332-342): contiguous
    runs of task ids — collect towns per country, cancel source rows,
    push each map when the next task id arrives (push_previous)."""
    defaults = dict(
        task_id="%{taskid}",
        rules=(
            CorrelationRule(
                "town", "logger = 'Town'", cancel=True,
                aggs=(AggSpec("towns", "collect_list", "named_struct('town_name', label)"),),
            ),
        ),
        timeout=1800.0,
        push_previous_map_as_event=True,
        timeout_task_id_field="country_name",
    )
    defaults.update(overrides)
    return PipelineConfig(**defaults)


def example5_config(**overrides) -> PipelineConfig:
    """Example #5 (docs/index.asciidoc:248-319; spec:219-265): long-running
    activity — absolute timeout + shorter inactivity_timeout."""
    defaults = dict(
        task_id="%{taskid}",
        rules=(
            CorrelationRule(
                "update", "logger = 'SQL'",
                aggs=(
                    AggSpec("total_duration", "sum", "duration"),
                    AggSpec("queries", "count"),
                ),
            ),
        ),
        timeout=600.0,
        inactivity_timeout=300.0,
        push_map_as_event_on_timeout=True,
        timeout_task_id_field="task_id_at_timeout",
        timeout_tags=("_aggregatetimeout",),
    )
    defaults.update(overrides)
    return PipelineConfig(**defaults)

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


# Persisted frames (sessions + exception-key sets) from the most recent
# cache_sessions=True pipeline. A new caching run releases the previous
# one's handles, so repeated multi-bucket jobs don't accumulate pinned
# blocks for the app lifetime. Releasing is SAFE here (unlike a
# range-partitioned index): both frames are deterministic pure functions
# of their inputs, so a still-lazy consumer of an older pipeline merely
# recomputes identical rows.
_LIVE_CACHES: list[DataFrame] = []


def release_pipeline_caches() -> None:
    """Unpersist frames cached by prior ``cache_sessions=True`` runs."""
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()


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


def _code_ran(r: CorrelationRule, with_incl: bool) -> F.Column:
    """True where the reference would actually RUN this rule's codeblock
    (``aggregate.rb:226``): the rule matched, the task id resolved
    (``aggregate.rb:183`` returns before the code otherwise), and the
    map-action guard passed (``aggregate.rb:203,216`` return before the
    code for a no-map ``update`` / duplicate ``create``). Emissions,
    exception tagging and cancellation are all code side-effects, so all
    three gate on this. For guard-gated rules the inclusion bit arrives
    pre-joined as ``_g_included`` (NULL ⇒ the row never reached the
    sessionized stream ⇒ the code did not run)."""
    cond = (F.col("_rule_id") == r.rule_id) & F.col("_task_id").isNotNull()
    if r.map_action != "create_or_update" and with_incl:
        cond = cond & F.coalesce(F.col("_g_included"), F.lit(False))
    return cond


def _exception_flag(cfg: PipelineConfig, with_incl: bool, with_tagged: bool = False) -> F.Column:
    """O19: a row whose codeblock RAN with a NULL required agg input — the
    reference's code would raise and tag ``_aggregateexception``
    (``aggregate.rb:229-237``). Gated rules' contribution arrives either
    as the joined ``_g_included`` bit (``with_incl``) or pre-decided as
    the broadcast ``_g_tagged`` key set (``with_tagged``)."""
    flag = (
        F.coalesce(F.col("_g_tagged"), F.lit(False)) if with_tagged else F.lit(False)
    )
    for r in cfg.rules:
        req = [s for s in r.aggs if s.required and s.col]
        if not req:
            continue
        if r.map_action != "create_or_update" and with_tagged:
            continue  # handled by the _g_tagged key set
        nulls = F.lit(False)
        for s in req:
            nulls = nulls | F.expr(s.col).isNull()
        flag = flag | (_code_ran(r, with_incl) & nulls)
    return flag


def tagged_exception_keys(guarded: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Row keys of guard-gated rows the reference's code would raise on:
    ``_included`` AND a NULL required input — evaluated on the guarded
    frame's pre-projected ``_v_*`` columns, so the decision rides the
    existing task exchange and the result is a FEW rows (nulls are the
    exception, literally) that broadcast back onto the passthrough
    without shuffling the event stream."""
    from logstash_filter_aggregate_spark.operators.correlate import value_col_name

    cond = F.lit(False)
    for r in cfg.rules:
        if r.map_action == "create_or_update":
            continue
        req = [s for s in r.aggs if s.required and s.col]
        if not req:
            continue
        nulls = F.lit(False)
        for s in req:
            nulls = nulls | F.col(value_col_name(r.rule_id, s.col)).isNull()
        cond = cond | ((F.col("_rule_id") == r.rule_id) & nulls)
    return (
        guarded.where(F.col("_included") & cond)
        .select("conv_id", "turn_idx", F.lit(True).alias("_g_tagged"))
    )


def _rejoinable_heavy_cols(
    classified: DataFrame, cfg: PipelineConfig, raw: DataFrame | None
) -> list[str]:
    """Columns safe to DROP from the shared-subtree checkpoint and rejoin
    from the raw scan afterwards: present untouched in the raw input
    (so the scan can restore them by row key) and never referenced by a
    post-checkpoint expression (agg inputs / emit exprs evaluate on the
    checkpointed frame in :func:`narrow_for_correlation` and
    :func:`_exception_flag`). In the transcript pipeline this is the raw
    ``text`` column — the single widest column of the stream."""
    if raw is None:
        return []
    import re as _re

    referenced = set()
    for r in cfg.rules:
        for s in r.aggs:
            if s.col:
                referenced.update(_re.findall(r"[A-Za-z_]\w*", s.col))
        for e in (r.emit or {}).values():
            referenced.update(_re.findall(r"[A-Za-z_]\w*", e))
    return [
        c for c in ("text",)
        if c in raw.columns and c in classified.columns and c not in referenced
        and c not in ("conv_id", "turn_idx", "ts")
    ]


def passthrough_shared_subtree(
    classified: DataFrame,
    cfg: PipelineConfig,
    open_maps: DataFrame | None,
    gated_cancel: bool,
    gated_ids: list[str],
    raw: DataFrame | None = None,
) -> DataFrame:
    """Single-job passthrough for guard-gated configs without
    ``cache_sessions``: the classified stream is lazily
    ``localCheckpoint``-ed, so the guard-resolution build side and the
    passthrough main stage read the SAME materialized blocks — ONE parse
    per passthrough job (the round-3 shape planned an independent second
    correlation subtree as the broadcast build side, re-running
    scan+parse+windows and doubling the job cost).

    Measured at sf0.1/local[32] (3M turns, example1 config, best-of-2
    steady): this shape 7.6s vs 10.8s for the round-3 double-compute,
    13.8s for inclusion windows inlined into the full-width stream (the
    wide rows drag text through ~8 sequential Window nodes), 8.5s for a
    columnar ``persist`` of the parsed frame (cache-build cost).

    Round 5 also measured a NARROW checkpoint + row-key text rejoin
    (``SPARK_GRAFT_PT_SHAPE=narrowck``): drop the raw ``text`` column
    from the checkpoint (the stream's single widest column, restorable
    from the raw scan) and inner-join it back onto the final passthrough
    by ``(conv_id, turn_idx)``. Four alternating steady reps at
    sf0.1/local[32]: fullck 6.8/7.0s (min/median) vs narrowck 7.0/7.3s —
    a wash; the text shuffle-join (sort + exchange of the text bytes)
    costs what the narrow checkpoint write/reads save, and on a real
    cluster the rejoin moves text over the NETWORK where the full-width
    checkpoint is executor-local disk. Default stays ``fullck``; the
    narrow shape is kept behind the env var as a measured alternative
    for deployments where local disk, not network, is the scarce
    resource (both shapes parity-tested).

    Scale notes: the checkpoint materializes the parsed stream once to
    executor-local storage — the same magnitude of local I/O as one
    full-stream shuffle leg, with no network. ``localCheckpoint``
    truncates lineage, so a lost executor fails the job instead of
    recomputing (the documented tradeoff ``operators/order.py`` already
    makes); multi-bucket jobs should prefer ``cache_sessions=True``,
    which keeps the passthrough scan-shaped against a persisted NARROW
    correlated frame (correlation materializes once for the whole job
    set, and text never leaves the scan).
    """
    from logstash_filter_aggregate_spark.operators.correlate import narrow_for_correlation
    from logstash_filter_aggregate_spark.plans.resume import inject_seeds

    import os as _os

    shape = _os.environ.get("SPARK_GRAFT_PT_SHAPE", "fullck")
    heavy = _rejoinable_heavy_cols(classified, cfg, raw) if shape == "narrowck" else []
    out_cols = [
        c for c in classified.columns
        if c not in (
            "_rule_id", "_task_id", "_end_flag", "_action", "_cancel",
            "_custom_timeout", "_custom_inactivity", "parse_tags",
        )
    ] + ["tags"]

    ck = classified.drop(*heavy).localCheckpoint(eager=False)
    correlated_in = inject_seeds(narrow_for_correlation(ck, cfg), open_maps, cfg)
    if gated_cancel:
        # cancellation needs per-row inclusion for EVERY matched row of
        # the gated rules (not just the rare null ones) — a row-key join,
        # both sides reading the checkpointed blocks
        guarded = apply_guards(sessionize(correlated_in, cfg), cfg)
        incl_df = guarded.where(F.col("_rule_id").isin(gated_ids)).select(
            "conv_id", "turn_idx", F.col("_included").alias("_g_included")
        )
        pt = passthrough_stream(ck, cfg, incl_df=incl_df)
    else:
        # The tagged-keys build side only needs `_included` for rows of
        # gated rules whose REQUIRED agg input is NULL — literally the
        # exceptions. Guard inclusion is a pure per-task property (every
        # window partitions by the task key), so the correlation subtree
        # can be pruned to the tasks CONTAINING a candidate row with a
        # broadcast semi-join BEFORE its exchange (guide §3.2 shape):
        # the guard-resolution exchange+sort then carries ~the candidate
        # tasks' rows instead of the whole event stream. Results are
        # identical — pruned-away tasks could never contribute a key.
        from logstash_filter_aggregate_spark.config import KIND_COL, TASK_ID_COL
        from logstash_filter_aggregate_spark.operators.correlate import value_col_name

        cand = F.lit(False)
        for r in cfg.rules:
            if r.map_action == "create_or_update":
                continue
            req = [s for s in r.aggs if s.required and s.col]
            if not req:
                continue
            nulls = F.lit(False)
            for s in req:
                nulls = nulls | F.col(value_col_name(r.rule_id, s.col)).isNull()
            cand = cand | ((F.col(KIND_COL) == r.rule_id) & nulls)
        cand_tasks = (
            correlated_in.where(F.col(TASK_ID_COL).isNotNull() & cand)
            .select(TASK_ID_COL)
            .distinct()
        )
        pruned = correlated_in.join(F.broadcast(cand_tasks), TASK_ID_COL, "left_semi")
        guarded = apply_guards(sessionize(pruned, cfg), cfg)
        tagged_df = tagged_exception_keys(guarded, cfg)
        pt = passthrough_stream(ck, cfg, tagged_df=tagged_df)
    if heavy:
        pt = pt.join(raw.select("conv_id", "turn_idx", *heavy), ["conv_id", "turn_idx"])
        pt = pt.select(*out_cols)
    return pt


def passthrough_stream(
    classified: DataFrame,
    cfg: PipelineConfig,
    incl_df: DataFrame | None = None,
    tagged_df: DataFrame | None = None,
) -> DataFrame:
    """The event stream continuing downstream (the reference yields every
    non-cancelled event, ``aggregate.rb:251-254``): original columns +
    accumulated tags; rows consumed by cancel rules dropped (U3,
    ``docs/index.asciidoc:235,244``). Both the cancel and the
    ``_aggregateexception`` tag are code side-effects, so they only apply
    where the code ran (:func:`_code_ran`).

    Guard-gated code rules need per-row inclusion, delivered one of two
    ways (configs without gated code rules pay neither — no join is
    planned):

    - ``tagged_df`` (gated REQUIRED-agg rules, the common case): the
      pre-decided exception keys broadcast onto the stream — the
      passthrough stays scan-shaped (zero event-stream shuffle); the
      build side re-runs the narrow correlation stage once.
    - ``incl_df`` (the prereduce path, or gated CANCEL rules): full
      per-row inclusion ``(conv_id, turn_idx, _g_included)`` joined on
      the row key — one extra exchange of the passthrough stream.

    Without ``cache_sessions``, :func:`passthrough_shared_subtree` wraps
    this so both deliveries read a lazily checkpointed classified stream
    (one parse per job).
    """
    df = classified
    if incl_df is not None:
        df = df.join(incl_df, ["conv_id", "turn_idx"], "left")
    elif tagged_df is not None:
        df = df.join(F.broadcast(tagged_df), ["conv_id", "turn_idx"], "left")
    with_incl = incl_df is not None
    cancel = F.lit(False)
    for r in cfg.rules:
        if r.cancel:
            cancel = cancel | _code_ran(r, with_incl)
    df = df.where(~cancel)
    exc = _exception_flag(cfg, with_incl, with_tagged=tagged_df is not None and incl_df is None)
    tags = F.col("parse_tags")
    tags = F.when(exc, F.array_union(tags, F.array(F.lit("_aggregateexception")))).otherwise(tags)
    df = df.withColumn("tags", tags)
    return df.drop(
        "_rule_id", "_task_id", "_end_flag", "_action", "_cancel",
        "_custom_timeout", "_custom_inactivity", "parse_tags", "_g_included", "_g_tagged",
    )


def inline_emissions(
    classified: DataFrame,
    cfg: PipelineConfig,
    guarded: DataFrame | None = None,
    incl_df: DataFrame | None = None,
) -> DataFrame | None:
    """O18 (``new_event_block``, ``aggregate.rb:91,226``): each row whose
    codeblock ran for a rule with ``emit`` produces one derived event
    immediately. The code runs only past the task-id resolution and the
    map-action guard (:func:`_code_ran`), so:

    - rules with ``create_or_update`` emit straight off the classified
      stream (guard always passes) — zero extra shuffle;
    - guard-gated rules read the pre-evaluated ``_e_*`` columns off the
      ``guarded`` sessionized frame where ``_included`` (riding the
      existing task exchange), or — on the prereduce path, where no
      per-row guarded frame exists — join ``incl_df`` back to the
      classified rows of that rule.
    """
    from logstash_filter_aggregate_spark.operators.correlate import emit_col_name

    outs: list[DataFrame] = []
    for r in cfg.rules:
        if not r.emit:
            continue
        if r.map_action != "create_or_update" and guarded is not None:
            rows = guarded.where((F.col("_rule_id") == r.rule_id) & F.col("_included"))
            outs.append(
                rows.select(*[F.col(emit_col_name(r.rule_id, n)).alias(n) for n in r.emit])
            )
        elif r.map_action != "create_or_update" and incl_df is not None:
            rows = classified.join(incl_df, ["conv_id", "turn_idx"], "left").where(
                _code_ran(r, with_incl=True)
            )
            outs.append(rows.select(*[F.expr(e).alias(n) for n, e in r.emit.items()]))
        else:
            rows = classified.where(_code_ran(r, with_incl=False))
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
    if cache_sessions:
        # this run registers fresh persisted frames below — release the
        # previous caching run's first (never frames from THIS run)
        release_pipeline_caches()
    parsed = transcripts if pre_parsed else parse(transcripts, groks, backend=parse_backend)
    parsed = enrich(parsed, dims)
    classified = classify(parsed, cfg)
    # rules whose code side-effects (emit / exception tag / cancel) are
    # guard-gated: their effects depend on per-row _included
    gated = [r for r in cfg.rules if r.map_action != "create_or_update"]
    gated_emit = any(r.emit for r in gated)
    gated_cancel = any(r.cancel for r in gated)
    gated_req = any(any(s.required and s.col for s in r.aggs) for r in gated)
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
    if cache_sessions and (gated_req or gated_cancel):
        # a multi-bucket GATED job consumes the guarded frame twice: the
        # session aggregation AND the gated-tag key set / cancel
        # inclusion frame. Persist the NARROW correlated frame so the
        # correlation stage (parse -> task exchange -> windows)
        # materializes exactly once across the whole job set. Narrow =
        # engine cols + pre-evaluated agg inputs only (no text), so the
        # persist footprint is a small fraction of the input even at
        # cluster scale. Ungated configs skip this — only the (tiny,
        # separately persisted) sessions frame is re-read there, and
        # caching the event stream would be pure overhead. Registered in
        # _LIVE_CACHES (released by the next caching run or
        # release_pipeline_caches()).
        guarded = guarded.persist()
        _LIVE_CACHES.append(guarded)

    # per-row inclusion for gated code side-effects (see the
    # passthrough_stream docstring for the cost model of each delivery).
    # Prereduce: the guarded frame holds super-rows, so inclusion resolves
    # on the classified stream with the narrow pre-window instead (valid
    # under prereduce's own no-mid-segment-expiry precondition).
    incl_df = None
    tagged_df = None
    shared_pt = False
    if prereduce_s is not None:
        if gated_emit or gated_cancel or gated_req:
            from logstash_filter_aggregate_spark.operators.skew import guard_inclusion_frame

            incl_df = guard_inclusion_frame(classified, cfg)
    elif (gated_cancel or gated_req) and not cache_sessions:
        # single-consumer default: the passthrough checkpoints the
        # classified stream lazily and derives both the guard resolution
        # and the main stage from it (passthrough_shared_subtree) — one
        # parse per job, no second correlation subtree
        shared_pt = True
    elif gated_cancel:
        gated_ids = [
            r.rule_id for r in gated
            if r.cancel or any(s.required and s.col for s in r.aggs)
        ]
        incl_df = guarded.where(F.col("_rule_id").isin(gated_ids)).select(
            "conv_id", "turn_idx", F.col("_included").alias("_g_included")
        )
    elif gated_req:
        tagged_df = tagged_exception_keys(guarded, cfg)
        if cache_sessions:
            # the key set is tiny — persist it too, so each passthrough
            # consumer broadcasts the rows instead of re-filtering the
            # (persisted) guarded frame
            tagged_df = tagged_df.persist()
            _LIVE_CACHES.append(tagged_df)

    sessions = aggregate_sessions(guarded, cfg)
    wm_value = None
    if cache_sessions:
        # the aggregated sessions are tiny relative to the event stream —
        # persist them so each bucket write doesn't recompute the final
        # aggregation, and materialize the watermark scalar once
        # (scan-only job) so the bucket plans embed a literal instead of
        # re-scanning the input.
        sessions = sessions.persist()
        _LIVE_CACHES.append(sessions)
        wm_value = transcripts.agg(F.max("ts")).first()[0]
    # watermark from the raw input: scan-only (ts column pruned down to
    # the parquet reader), so routing never recomputes the pipeline
    routed: RoutedSessions = route_sessions(
        sessions, cfg, watermark_df=transcripts, watermark_value=wm_value
    )

    inline = routed.inline
    emitted = inline_emissions(
        classified, cfg,
        guarded=guarded if (gated_emit and prereduce_s is None) else None,
        incl_df=incl_df if gated_emit else None,
    )
    if emitted is not None:
        inline = inline.unionByName(emitted, allowMissingColumns=True)

    return PipelineOutputs(
        completed=routed.completed,
        timeout=routed.timeout,
        inline=inline,
        open=routed.open,
        passthrough=(
            passthrough_shared_subtree(
                classified, cfg, open_maps, gated_cancel,
                [
                    r.rule_id for r in gated
                    if r.cancel or any(s.required and s.col for s in r.aggs)
                ],
                raw=transcripts if not pre_parsed else None,
            )
            if shared_pt
            else passthrough_stream(
                classified, cfg,
                incl_df=incl_df if (gated_cancel or gated_req) else None,
                tagged_df=tagged_df,
            )
        ),
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

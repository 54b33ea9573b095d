"""Structured Streaming variant (SURVEY.md §7 item 5).

Two forms, matching how much of the reference's semantics a stream
needs:

- :func:`session_window_aggregate` — the pure gap-session shape
  (docs example #3/#5, no end-events): built-in
  ``F.session_window(ts, gap)`` + watermark. Fully Catalyst-native,
  state handled by Spark's streaming aggregation.

- :func:`streaming_correlate` — the full map lifecycle
  (``map_action`` guards, ``end_of_task``, duplicate-start, timeouts)
  via ``applyInPandasWithState`` keyed by task id with
  ``EventTimeTimeout``: the state cell IS the reference's per-task map
  (``aggregate.rb:199-246``), so this is the one place the engine runs
  the reference's serial algorithm — per key, per micro-batch, inside an
  Arrow batch. The batch engine remains the correctness reference; tests
  assert the streaming results match it on the same input.

The parse/classify stages are the same Catalyst expressions as batch —
they work unchanged on a streaming DataFrame.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from logstash_filter_aggregate_spark.config import PipelineConfig
from logstash_filter_aggregate_spark.operators.classify import classify
from logstash_filter_aggregate_spark.plans.pipeline import compile_groks, parse


def _is_nullish(v) -> bool:
    """True for NaN/NaT (self-inequality) — the pandas null family that
    must become JSON null, not a NaN token or a stringified 'NaT'."""
    try:
        return bool(v != v)
    except (TypeError, ValueError):
        return False

STATE_SCHEMA = T.StructType(
    [
        T.StructField("creation_ts", T.DoubleType()),
        T.StructField("lastevent_ts", T.DoubleType()),
        T.StructField("nevents", T.LongType()),
        T.StructField("map_json", T.StringType()),
        # per-map custom timeout overrides (O17, aggregate.rb:243-246):
        # set by user rules mid-map, must survive across micro-batches
        T.StructField("eff_timeout", T.DoubleType()),
        T.StructField("eff_inactivity", T.DoubleType()),
    ]
)

# processing-time mode (O11/O12 in the reference's DEFAULT time model,
# aggregate.rb:487 `Time.now`): wall-clock deadlines ride in two extra
# state fields — the absolute age cap set when the map is created, and
# the wall time of the last arrival (for inactivity-on-arrival checks)
PROC_STATE_SCHEMA = T.StructType(
    list(STATE_SCHEMA.fields)
    + [
        T.StructField("wall_cap", T.DoubleType()),
        T.StructField("wall_last", T.DoubleType()),
    ]
)

_WALL_INF = float("inf")

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("task_id", T.StringType()),
        T.StructField("sink", T.StringType()),  # completed | timeout | inline
        T.StructField("creation_ts", T.TimestampType()),
        T.StructField("lastevent_ts", T.TimestampType()),
        T.StructField("nevents", T.LongType()),
        T.StructField("map_json", T.StringType()),  # the reference's map, as JSON
    ]
)


def session_window_aggregate(
    stream_df: DataFrame,
    cfg: PipelineConfig,
    watermark: str = "10 minutes",
    groks=None,
) -> DataFrame:
    """Gap sessions with the built-in session_window (O10 streaming form).
    Emits one row per closed session once the watermark passes its end."""
    from logstash_filter_aggregate_spark.operators.classify import task_id_expr
    from logstash_filter_aggregate_spark.operators.correlate import _merged_agg_specs, _value_expr

    parsed = parse(stream_df, groks or compile_groks())
    classified = classify(parsed, cfg)
    part = classified.where(F.col("_task_id").isNotNull() & F.col("_rule_id").isNotNull())
    gap = f"{cfg.effective_inactivity_timeout} seconds"
    # event-time order key for order-sensitive fns: streaming aggregation
    # is unordered, so first/last/collect_list ride on a struct min/max
    # over this key — same `_ord` discipline as the batch engine.
    ord_key = F.struct(F.col("ts"), F.col("conv_id"), F.col("turn_idx"))
    aggs = []
    for name, (fn, sources) in _merged_agg_specs(cfg).items():
        val = _value_expr(sources)
        if fn == "count":
            aggs.append(F.count(F.when(F.col("_rule_id").isin([r for r, _ in sources]), 1)).alias(name))
        elif fn == "first":
            # first non-null in EVENT-TIME order (not min-by-value)
            aggs.append(
                F.min(F.when(val.isNotNull(), F.struct(ord_key.alias("o"), val.alias("v"))))["v"].alias(name)
            )
        elif fn == "last":
            aggs.append(
                F.max(F.when(val.isNotNull(), F.struct(ord_key.alias("o"), val.alias("v"))))["v"].alias(name)
            )
        elif fn in ("collect_list", "collect_set"):
            items = F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(val.isNotNull(), F.struct(ord_key.alias("o"), val.alias("v")))
                    )
                ),
                lambda x: x["v"],
            )
            aggs.append((F.array_distinct(items) if fn == "collect_set" else items).alias(name))
        else:
            aggs.append(getattr(F, fn)(val).alias(name))
    return (
        part.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("_task_id").alias("task_id"))
        .agg(
            F.min("ts").alias("creation_ts"),
            F.max("ts").alias("lastevent_ts"),
            F.count(F.lit(1)).alias("nevents"),
            *aggs,
        )
    )


def _agg_value_col(rule_id: str, name: str) -> str:
    return f"_v_{rule_id}_{name}"


def _emit_value_col(rule_id: str, name: str) -> str:
    return f"_em_{rule_id}_{name}"


def _norm(v):
    if v is None or _is_nullish(v):
        return None
    return v.item() if hasattr(v, "item") else v


def _ts_us(sec: float) -> pd.Timestamp:
    # the state keeps epoch-seconds doubles; float64 is exact to
    # <0.25µs here but ns-residue appears on reconstruction and
    # Arrow's safe µs cast rejects it — round("us") recovers the
    # original microsecond exactly
    return pd.Timestamp(sec, unit="s").round("us")


def _build_rule_attrs(cfg: PipelineConfig) -> dict:
    return {
        r.rule_id: dict(
            map_action=r.map_action,
            end_of_task=r.end_of_task,
            has_custom_timeout=r.custom_timeout is not None,
            has_custom_inactivity=r.custom_inactivity_timeout is not None,
        )
        for r in cfg.rules
    }


def _build_agg_specs(cfg: PipelineConfig) -> dict[str, tuple]:
    """Agg specs merged by name across rules (a shared name accumulates
    into ONE map entry, interleaved in event order — spec parity with
    the per-row walk the vectorized scan replaced)."""
    agg_specs: dict[str, tuple] = {}
    for r in cfg.rules:
        for s in r.aggs:
            fn_, pairs = agg_specs.setdefault(s.name, (s.fn, []))
            pairs.append(
                (r.rule_id, _agg_value_col(r.rule_id, s.name) if s.col else None)
            )
    return agg_specs


def _merge_carried(agg_specs: dict, carried: dict, batch: dict) -> dict:
    """Combine the state cell's accumulated map with this batch's
    per-session aggregate, per agg function semantics."""
    if not carried:
        return batch
    out = dict(carried)
    for name, v in batch.items():
        if name not in out:
            out[name] = v
            continue
        fn_ = agg_specs[name][0] if name in agg_specs else "last"
        if fn_ in ("count", "sum"):
            out[name] = out[name] + v
        elif fn_ == "min":
            out[name] = min(out[name], v)
        elif fn_ == "max":
            out[name] = max(out[name], v)
        elif fn_ == "first":
            pass                            # carried first wins
        elif fn_ == "collect_list":
            out[name] = list(out[name]) + list(v)
        elif fn_ == "collect_set":
            cur = list(out[name])
            out[name] = cur + [x for x in v if x not in cur]
        else:                               # last
            out[name] = v
    return out


def _session_agg_maps(whole, cr_idx, sess_cr, srid, n_sess: int, agg_specs: dict):
    """Per-session aggregation dictionaries: one set of vectorized passes
    per agg name over the code-ran rows. ``sess_cr`` may number sessions
    across MANY tasks (the shard tier) — the math is identical as long as
    session ids are globally unique within the chunk."""
    import numpy as np

    sess_maps: list[dict] = [dict() for _ in range(n_sess)]
    if not cr_idx.size:
        return sess_maps
    for name, (fn_, pairs) in agg_specs.items():
        if fn_ == "count":
            ind = np.zeros(len(cr_idx), dtype=bool)
            for rid_, _col in pairs:
                ind |= (srid == rid_).astype(bool)
            cnt = np.bincount(sess_cr[ind], minlength=n_sess)
            for si_ in np.flatnonzero(cnt):
                sess_maps[int(si_)][name] = int(cnt[si_])
            continue
        parts = []
        for rid_, col in pairs:
            if col is None:
                continue
            m = (srid == rid_).astype(bool)
            if not m.any():
                continue
            v = whole[col].iloc[cr_idx[m]]
            nn = v.notna().to_numpy()
            if not nn.any():
                continue
            parts.append(pd.DataFrame({
                "sess": sess_cr[m][nn],
                "pos": cr_idx[m][nn],
                "val": v.to_numpy()[nn],
            }))
        if not parts:
            continue
        dfp = parts[0] if len(parts) == 1 else pd.concat(
            parts, ignore_index=True
        ).sort_values("pos", kind="mergesort")
        g = dfp.groupby("sess")["val"]
        if fn_ == "sum":
            agg_res = g.sum()
        elif fn_ == "min":
            agg_res = g.min()
        elif fn_ == "max":
            agg_res = g.max()
        elif fn_ == "first":
            agg_res = g.first()
        elif fn_ == "last":
            agg_res = g.last()
        elif fn_ == "collect_list":
            agg_res = g.agg(list)
        else:                            # collect_set: stable dedupe
            agg_res = g.agg(lambda s: list(dict.fromkeys(s)))
        for si_, v_ in agg_res.items():
            sess_maps[int(si_)][name] = (
                [_norm(x) for x in v_] if isinstance(v_, list) else _norm(v_)
            )
    return sess_maps


def _make_stateful_fn(cfg: PipelineConfig, time_mode: str = "event"):
    """Build the per-key stateful function: the reference's filter() hot
    path (aggregate.rb:179-255) over one task's micro-batch rows. Agg
    inputs arrive pre-projected as ``_v_<rule>_<name>`` columns so SQL
    expressions (not just plain columns) work as agg sources.

    The state machine runs vectorized (:func:`walk.walk_scan`): the scan
    yields per-row code-ran flags + per-session close records, the
    aggregation dictionary is a pandas groupby over the code-ran rows
    keyed by session (one set of vectorized passes per agg name, not a
    per-row dict update), and the carried ``map_json`` merges into the
    carried session's batch aggregate by each function's combine rule.
    Interpreted work is O(#sessions + #emit rows), not O(rows).

    ``time_mode='processing'`` models the reference's DEFAULT clock
    (``Time.now``, aggregate.rb:487): maps expire ``timeout`` WALL
    seconds after creation / ``inactivity_timeout`` after the last
    arrival, checked on arrival and by processing-time timers — event
    timestamps never split sessions (see
    :func:`streaming_correlate` for the semantics note)."""
    import numpy as np

    from logstash_filter_aggregate_spark.streaming.walk import CT0, END, OPEN, scan_chunk

    rule_attrs = _build_rule_attrs(cfg)
    agg_specs = _build_agg_specs(cfg)
    # new_event_block emissions (O18): fire exactly where the code runs —
    # the state walk IS the guard decision, so gated emit rules work here
    emit_rules = {
        r.rule_id: [(n, _emit_value_col(r.rule_id, n)) for n in (r.emit or {})]
        for r in cfg.rules if r.emit
    }
    timeout_s = float(cfg.timeout)
    inactivity_s = float(cfg.effective_inactivity_timeout)
    proc_mode = time_mode == "processing"
    push = cfg.push_map_as_event_on_timeout
    out_cols = [f.name for f in OUTPUT_SCHEMA.fields]

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        task_id = key[0]
        if task_id is None:
            # the null-task group: heartbeat/unmatched rows admitted only
            # to advance the watermark — no map, no state, no output
            yield pd.DataFrame(columns=out_cols)
            return
        out_rows: list[dict] = []

        if state.hasTimedOut:
            sv = state.get
            if push:
                out_rows.append(dict(
                    task_id=task_id, sink="timeout",
                    creation_ts=_ts_us(sv[0]), lastevent_ts=_ts_us(sv[1]),
                    nevents=sv[2], map_json=sv[3],
                ))
            state.remove()
            yield pd.DataFrame(out_rows, columns=out_cols)
            return

        now = state.getCurrentProcessingTimeMs() / 1000.0 if proc_mode else 0.0
        init = None
        init_map: dict = {}
        carried_cap = None
        if state.exists:
            sv = state.get
            c, l, nv, mj, eto, ein = sv[:6]
            if proc_mode:
                # wall-clock expiry on arrival (aggregate.rb:194-199 with
                # the real-time clock): a map whose age cap or inactivity
                # window lapsed between batches evicts BEFORE this
                # chunk's guards run — same push as a fired timer
                wall_cap, wall_last = sv[6], sv[7]
                if now >= wall_cap or now - wall_last >= inactivity_s:
                    if push:
                        out_rows.append(dict(
                            task_id=task_id, sink="timeout",
                            creation_ts=_ts_us(c), lastevent_ts=_ts_us(l),
                            nevents=nv, map_json=mj,
                        ))
                    state.remove()
                else:
                    init = (c, l, nv, _WALL_INF, _WALL_INF)
                    init_map = json.loads(mj) if mj else {}
                    carried_cap = wall_cap
            else:
                init = (
                    c, l, nv,
                    eto if eto is not None else timeout_s,
                    ein if ein is not None else inactivity_s,
                )
                init_map = json.loads(mj) if mj else {}

        # Spark gives NO ordering guarantee across the Arrow chunks of one
        # key's group (a task whose micro-batch exceeds
        # arrow.maxRecordsPerBatch arrives as several chunks) — materialize
        # and sort ONCE so hot tasks keep event-time order end-to-end.
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            yield pd.DataFrame(columns=out_cols)
            return
        whole = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        whole = whole.sort_values(["ts", "conv_id", "turn_idx"], kind="mergesort")
        nrows = len(whole)

        if proc_mode:
            # event time never expires maps here: keep only timeout=0
            # instant evictions (clock-independent), drop >0 overrides
            # (wall-deadline overrides are event-mode features — doc'd)
            whole["_custom_timeout"] = whole["_custom_timeout"].where(
                whole["_custom_timeout"] == 0
            )
            whole["_custom_inactivity"] = np.nan
            code_ran, res, sub_idx = scan_chunk(
                whole, rule_attrs, init, _WALL_INF, _WALL_INF
            )
        else:
            code_ran, res, sub_idx = scan_chunk(
                whole, rule_attrs, init, timeout_s, inactivity_s
            )
        if sub_idx is None:
            sess_full = res.sess_id
        else:
            sess_full = np.full(nrows, -1, dtype=np.int32)
            sess_full[sub_idx] = res.sess_id
        n_sess = len(res.sessions)
        cr_idx = np.flatnonzero(code_ran)
        sess_cr = sess_full[cr_idx]

        # per-session aggregation dictionaries: one set of vectorized
        # passes per agg name over the code-ran rows
        srid = whole["_rule_id"].to_numpy()[cr_idx] if cr_idx.size else np.empty(0, dtype=object)
        sess_maps = _session_agg_maps(whole, cr_idx, sess_cr, srid, n_sess, agg_specs)
        if init is not None and n_sess:
            sess_maps[0] = _merge_carried(agg_specs, init_map, sess_maps[0])

        # closed sessions -> sink rows
        for si_, (creation, last_ts, kind, _crow) in enumerate(res.sessions):
            if kind == OPEN:
                continue
            if kind == END:
                sink = "completed"               # aggregate.rb:240
            elif kind == CT0:
                # map_meta.timeout = 0: immediate eviction, pushed only
                # when configured (spec:392-409; aggregate.rb:259-274)
                sink = "inline" if push else None
            else:
                sink = "timeout" if push else None
            if sink is None:
                continue
            out_rows.append(dict(
                task_id=task_id, sink=sink,
                creation_ts=_ts_us(creation), lastevent_ts=_ts_us(last_ts),
                nevents=int(res.nevents[si_]),
                map_json=json.dumps(sess_maps[si_], default=str),
            ))

        # emit rows (sink='emit'): one per code-ran row of an emit rule,
        # carrying the state AS OF that row (nevents so far, own ts)
        if emit_rules and cr_idx.size:
            nev_sofar = np.empty(len(cr_idx), dtype="int64")
            if len(cr_idx):
                change = np.empty(len(cr_idx), dtype=bool)
                change[0] = True
                change[1:] = sess_cr[1:] != sess_cr[:-1]
                grp_start = np.flatnonzero(change)
                sizes = np.diff(np.append(grp_start, len(cr_idx)))
                offsets = np.repeat(grp_start, sizes)
                nev_sofar = np.arange(len(cr_idx), dtype="int64") - offsets + 1
                if init is not None:
                    nev_sofar[sess_cr == 0] += int(init[2])
            creations = np.asarray([s[0] for s in res.sessions])
            for rid_, ems in emit_rules.items():
                m = (srid == rid_).astype(bool)
                if not m.any():
                    continue
                rows_pos = cr_idx[m]
                # None/NaN/NaT normalize to real JSON null (batch inline
                # emissions carry SQL nulls; pandas NaN would survive
                # json.dumps as a non-standard NaN token and NaT would
                # stringify via default=str)
                colvals = {
                    n: whole[c].to_numpy(dtype=object)[rows_pos] for n, c in ems
                }
                ts_vals = whole["ts"].iloc[rows_pos].to_numpy()
                s_cre = creations[sess_cr[m]]
                s_nev = nev_sofar[m]
                for k in range(len(rows_pos)):
                    payload = {n: _norm(colvals[n][k]) for n, _c in ems}
                    out_rows.append(dict(
                        task_id=task_id, sink="emit",
                        creation_ts=_ts_us(float(s_cre[k])),
                        lastevent_ts=pd.Timestamp(ts_vals[k]),
                        nevents=int(s_nev[k]),
                        map_json=json.dumps(payload, default=str),
                    ))

        if res.final is not None:
            creation, last, nev, eff_to, eff_in = res.final
            mj_out = json.dumps(sess_maps[n_sess - 1], default=str)
            if proc_mode:
                # the open session keeps its creation-time age cap; a map
                # created THIS batch gets now + timeout (wall clock)
                cap = (
                    carried_cap
                    if carried_cap is not None and n_sess == 1
                    else now + timeout_s
                )
                state.update((
                    creation, last, int(nev), mj_out, None, None, cap, now,
                ))
                state.setTimeoutDuration(
                    max(int(min(inactivity_s, cap - now) * 1000), 1)
                )
            else:
                state.update((
                    creation, last, int(nev), mj_out, eff_to, eff_in,
                ))
                state.setTimeoutTimestamp(
                    _clamped_expiry_ms(min(creation + eff_to, last + eff_in), state)
                )
        elif state.exists:
            state.remove()
        yield pd.DataFrame(out_rows, columns=out_cols)

    return fn


def _clamped_expiry_ms(expiry_s: float, state: GroupState) -> int:
    """Event-time timers must land strictly after the current watermark:
    a short custom-timeout override can put a map's expiry behind a
    watermark other keys have already advanced, and Spark rejects such a
    setTimeoutTimestamp call outright (failing the whole query). Clamp to
    watermark+1 ms — the map is already expired, so the earliest legal
    firing (next micro-batch) is the right semantics."""
    expiry_ms = int(expiry_s * 1000)
    wm_ms = state.getCurrentWatermarkMs()
    return max(expiry_ms, wm_ms + 1)


def streaming_correlate(
    stream_df: DataFrame,
    cfg: PipelineConfig,
    groks=None,
    watermark: str = "10 minutes",
    shards: int | None = None,
    time_mode: str = "event",
) -> DataFrame:
    """Full-map-lifecycle streaming correlation. Returns one appended row
    per closed map with a ``sink`` column; split to routed sinks with
    ``foreachBatch`` filters.

    ``shards``: opt-in state amortization for high-cardinality task ids —
    key the state by ``hash(task_id) % shards`` instead of per task,
    multiplexing every live task's cell into one state row per shard
    (see :mod:`streaming.shard` for the measured per-key floor this
    removes and the tradeoffs). Identical output rows; a timeout push can
    land a micro-batch later than per-key mode.

    ``time_mode``: ``'event'`` (default) expires maps by EVENT time —
    the deterministic model the batch engine replays and the oracles
    certify. ``'processing'`` is the reference's DEFAULT clock
    (``Time.now``, aggregate.rb:487 / the periodic flush at :312): a map
    expires ``timeout`` WALL seconds after it was created or
    ``inactivity_timeout`` after its last arrival, regardless of event
    timestamps — checked on arrival and via
    ``GroupStateTimeout.ProcessingTimeTimeout`` timers, so a LIVE stream
    honors it exactly where the batch engine can only model its
    instantaneous-replay limit. Documented divergences: timings depend
    on the wall clock (tests assert structure, not latencies);
    ``map_meta.timeout = 0`` instant eviction still fires, but >0
    per-map overrides are event-mode features and are ignored. Composes
    with ``shards`` (r6): cells expire by the wall clock with one
    processing-time timer per shard at the min remaining deadline."""
    if time_mode not in ("event", "processing"):
        raise ValueError(f"time_mode must be 'event' or 'processing', got {time_mode!r}")
    parsed = parse(stream_df, groks or compile_groks())
    classified = classify(parsed, cfg)
    value_cols = [
        F.expr(sp.col).alias(_agg_value_col(r.rule_id, sp.name))
        for r in cfg.rules for sp in r.aggs if sp.col
    ] + [
        F.expr(e).alias(_emit_value_col(r.rule_id, n))
        for r in cfg.rules for n, e in (r.emit or {}).items()
    ]
    # Heartbeat rows (conv_id == HEARTBEAT_CONV, matching no rule) pass
    # the match filter so they can advance the event-time watermark —
    # the mechanism replay_routed uses to flush state timeouts on a
    # finite corpus. They reach the stateful fn as the null-task group,
    # which emits nothing and keeps no state. (A filter predicate alone
    # can't protect the watermark: Catalyst splits conjunctions and
    # pushes the non-ts conjuncts below the EventTimeWatermark node.)
    # processing mode needs no event-time watermark (timers are wall
    # clock; late events are a non-concept under the real-time model)
    wm = (
        classified if time_mode == "processing"
        else classified.withWatermark("ts", watermark)
    )
    part = (
        wm.where(
            (F.col("_task_id").isNotNull() & F.col("_rule_id").isNotNull())
            | (F.col("conv_id") == HEARTBEAT_CONV)
        )
        .select(
            "_task_id", "_rule_id", "conv_id", "turn_idx", "ts",
            "_custom_timeout", "_custom_inactivity", *value_cols,
        )
    )
    if shards:
        from logstash_filter_aggregate_spark.streaming.shard import (
            SHARD_STATE_SCHEMA,
            make_correlate_shard_fn,
        )

        return (
            part.withColumn(
                "_shard", F.pmod(F.xxhash64("_task_id"), F.lit(int(shards)))
            )
            .groupBy("_shard")
            .applyInPandasWithState(
                make_correlate_shard_fn(cfg, time_mode=time_mode),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=SHARD_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=(
                    GroupStateTimeout.ProcessingTimeTimeout
                    if time_mode == "processing"
                    else GroupStateTimeout.EventTimeTimeout
                ),
            )
        )
    if time_mode == "processing":
        return part.groupBy("_task_id").applyInPandasWithState(
            _make_stateful_fn(cfg, time_mode="processing"),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=PROC_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    return part.groupBy("_task_id").applyInPandasWithState(
        _make_stateful_fn(cfg),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


STREAM_SINKS = ("completed", "timeout", "inline", "emit")
# reserved conv_id for replay_routed's watermark-advancing sentinel rows
HEARTBEAT_CONV = "__heartbeat__"


def stream_to_routed_sinks(
    correlated: DataFrame,
    base_path: str,
    checkpoint: str,
    fmt: str = "parquet",
    available_now: bool = True,
):
    """U5 for the streaming variant: fan the :func:`streaming_correlate`
    output out to one directory per sink. ``writeStream`` supports a
    single sink per query, so the fan-out happens inside ONE
    ``foreachBatch`` riding ONE checkpoint (the reference's multi-output
    fan-out, ``docs/index.asciidoc`` routed outputs, over a stream).

    Exactly-once on replay: each micro-batch writes to a Hive-style
    ``batch_id=N`` subdirectory with ``overwrite`` mode — a batch replayed
    after a crash overwrites its own directory instead of appending
    duplicates (the standard idempotent-foreachBatch pattern). Readers
    just ``spark.read.parquet(f"{base_path}/<sink>")``.
    """

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for sink in STREAM_SINKS:
                rows = batch_df.where(F.col("sink") == sink).drop("sink")
                rows.write.mode("overwrite").format(fmt).save(
                    f"{base_path}/{sink}/batch_id={batch_id}"
                )
        finally:
            batch_df.unpersist()

    writer = (
        correlated.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_inline_emissions(stream_df: DataFrame, cfg: PipelineConfig, groks=None) -> DataFrame:
    """O18 over a stream: ``new_event_block`` emissions for
    ``create_or_update`` rules are stateless per matched row (the guard
    always passes, ``aggregate.rb:202``), so they are a plain streaming
    projection — no state, no watermark. Guard-gated emit rules
    (``map_action`` create/update) depend on per-row map state that keyed
    streaming state CAN express but this helper does not implement; they
    raise rather than silently emit rows the reference would suppress
    (use the batch engine / replay_push_previous for those shapes)."""
    from logstash_filter_aggregate_spark.config import ConfigurationError

    gated = [r.rule_id for r in cfg.rules if r.emit and r.map_action != "create_or_update"]
    if gated:
        raise ConfigurationError(
            f"streaming inline emissions require map_action='create_or_update' "
            f"for emit rules (guard-gated here: {gated}); gated emit rules ARE "
            f"supported by streaming_correlate — read its sink='emit' rows "
            f"(payload in map_json), emitted exactly where the codeblock runs"
        )
    parsed = parse(stream_df, groks or compile_groks())
    classified = classify(parsed, cfg)
    outs = []
    for r in cfg.rules:
        if not r.emit:
            continue
        rows = classified.where(
            (F.col("_rule_id") == r.rule_id) & F.col("_task_id").isNotNull()
        )
        outs.append(rows.select(*[F.expr(e).alias(n) for n, e in r.emit.items()]))
    if not outs:
        raise ConfigurationError("no emit rules in config")
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o, allowMissingColumns=True)
    return df


_PT_ENGINE_COLS = (
    "_rule_id", "_task_id", "_end_flag", "_action", "_cancel",
    "_custom_timeout", "_custom_inactivity",
)


def streaming_passthrough(
    stream_df: DataFrame,
    cfg: PipelineConfig,
    groks=None,
    watermark: str = "10 minutes",
    shards: int | None = None,
    time_mode: str = "event",
) -> DataFrame:
    """O19 + U3 over a stream — the streaming parity of the batch
    ``passthrough_stream``: every non-cancelled event continues
    downstream (``aggregate.rb:251-254``) carrying its accumulated tags;
    rows whose codeblock would raise (NULL required agg input) are tagged
    ``_aggregateexception``; rows consumed by cancel rules are dropped.

    Two tiers, matching how much state the config needs:

    - **ungated configs** (every rule ``create_or_update``): the guard
      always passes, so tags and cancels are pure column expressions —
      the batch :func:`passthrough_stream` works unchanged on the
      streaming frame (stateless, no watermark, full Catalyst codegen).
    - **guard-gated cancel / required-agg rules**: whether the code ran
      depends on per-task map state, so PARTICIPATING rows ride the same
      keyed state walk as :func:`streaming_correlate` (expiry-on-arrival
      before the guard, duplicate-create and no-map-update suppression,
      ``map_meta`` overrides, ``end_of_task`` deletion — mirroring
      ``aggregate.rb:179-246``), emitting each input row back out with
      its tags, or not at all when cancelled. Non-participating rows
      (no rule / unresolved task id) take a stateless branch that is
      unioned in — a self-union of the source, so each branch tracks the
      same files independently.

    Scale note: the gated tier serializes the participating rows
    (full width) through one Arrow round-trip per micro-batch — the
    price of reference-exact guard decisions on a stream; the batch
    engine remains the cheap path for bulk replays. When the corpus has
    MANY tasks with FEW rows each, the per-key-per-batch framework cost
    of ``applyInPandasWithState`` dominates; pass ``shards`` to key the
    state by ``hash(task_id) % shards`` and amortize it (identical
    output; see :mod:`streaming.shard`; measured at 613k tasks / 3M
    turns: 20.9k → 59.6k turns/s with shards=512).

    ``time_mode='processing'``: wall-clock state expiry (the reference's
    default clock) — see :func:`streaming_correlate` for semantics and
    documented divergences; composes with ``shards``.
    """
    if time_mode not in ("event", "processing"):
        raise ValueError(f"time_mode must be 'event' or 'processing', got {time_mode!r}")
    parsed = parse(stream_df, groks or compile_groks())
    classified = classify(parsed, cfg)
    gated_relevant = [
        r for r in cfg.rules
        if r.map_action != "create_or_update"
        and (r.cancel or any(s.required and s.col for s in r.aggs))
    ]
    if not gated_relevant:
        from logstash_filter_aggregate_spark.plans.pipeline import passthrough_stream

        return passthrough_stream(classified, cfg)

    req_cols = [
        F.expr(s.col).alias(_agg_value_col(r.rule_id, s.name))
        for r in cfg.rules for s in r.aggs if s.required and s.col
    ]
    participates = F.col("_task_id").isNotNull() & F.col("_rule_id").isNotNull()
    out_cols = [
        c for c in classified.columns
        if c not in _PT_ENGINE_COLS and c != "parse_tags"
    ]
    out_schema = T.StructType(
        [classified.schema[c] for c in out_cols]
        + [T.StructField("tags", T.ArrayType(T.StringType()))]
    )
    stateless = (
        classified.where(~participates)
        .withColumn("tags", F.col("parse_tags"))
        .select(*out_cols, "tags")
    )
    wm = (
        classified if time_mode == "processing"
        else classified.withWatermark("ts", watermark)
    )
    part = (
        wm.where(participates)
        .select(*classified.columns, *req_cols)
    )
    if shards:
        from logstash_filter_aggregate_spark.streaming.shard import (
            SHARD_STATE_SCHEMA,
            make_passthrough_shard_fn,
        )

        walked = (
            part.withColumn(
                "_shard", F.pmod(F.xxhash64("_task_id"), F.lit(int(shards)))
            )
            .groupBy("_shard")
            .applyInPandasWithState(
                make_passthrough_shard_fn(cfg, out_cols, time_mode=time_mode),
                outputStructType=out_schema,
                stateStructType=SHARD_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=(
                    GroupStateTimeout.ProcessingTimeTimeout
                    if time_mode == "processing"
                    else GroupStateTimeout.EventTimeTimeout
                ),
            )
        )
        return walked.unionByName(stateless)
    fn = _make_passthrough_fn(cfg, out_cols, time_mode=time_mode)
    proc = time_mode == "processing"
    walked = part.groupBy("_task_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=PROC_STATE_SCHEMA if proc else STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if proc else GroupStateTimeout.EventTimeTimeout
        ),
    )
    return walked.unionByName(stateless)


def _make_passthrough_fn(cfg: PipelineConfig, out_cols: list[str],
                         time_mode: str = "event"):
    """Per-key walk for :func:`streaming_passthrough`'s gated tier: the
    same state transitions as :func:`_make_stateful_fn` (the reference
    filter hot path), but the OUTPUT is the input rows themselves —
    tagged where the code would raise, suppressed where it cancels. The
    state cell reuses STATE_SCHEMA with an empty map (aggregates are the
    session engine's concern, not the passthrough's); event-time timers
    are registered purely so dead tasks' state is reclaimed.

    The state machine runs vectorized (:func:`walk.walk_scan` — the
    numpy session-hop shared with the batch exact tiers' structure), so
    a hot key's million-row micro-batch costs O(#sessions · log n)
    interpreted work plus numpy passes, not a per-row Python loop."""
    import numpy as np

    from logstash_filter_aggregate_spark.streaming.walk import scan_chunk

    rule_attrs = {
        r.rule_id: dict(
            map_action=r.map_action,
            end_of_task=r.end_of_task,
            cancel=bool(r.cancel),
            has_custom_timeout=r.custom_timeout is not None,
            has_custom_inactivity=r.custom_inactivity_timeout is not None,
            req_cols=[
                _agg_value_col(r.rule_id, s.name)
                for s in r.aggs if s.required and s.col
            ],
        )
        for r in cfg.rules
    }
    cancel_map = {r: a["cancel"] for r, a in rule_attrs.items()}
    timeout_s = float(cfg.timeout)
    inactivity_s = float(cfg.effective_inactivity_timeout)
    proc_mode = time_mode == "processing"
    n_out = len(out_cols) + 1
    _EXC = ["_aggregateexception"]
    _EMPTY: list = []

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(columns=[*out_cols, "tags"]).iloc[0:0]
            return
        now = state.getCurrentProcessingTimeMs() / 1000.0 if proc_mode else 0.0
        init = None
        carried_cap = None
        if state.exists:
            sv = state.get
            c, l, n, _mj, eto, ein = sv[:6]
            if proc_mode:
                wall_cap, wall_last = sv[6], sv[7]
                if now >= wall_cap or now - wall_last >= inactivity_s:
                    state.remove()     # wall expiry on arrival: state only
                else:
                    init = (c, l, n, _WALL_INF, _WALL_INF)
                    carried_cap = wall_cap
            else:
                init = (
                    c, l, n,
                    eto if eto is not None else timeout_s,
                    ein if ein is not None else inactivity_s,
                )
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            yield pd.DataFrame(columns=[*out_cols, "tags"]).iloc[0:0]
            return
        # Spark gives NO ordering guarantee across the Arrow chunks of one
        # key's group — materialize and sort ONCE (hot tasks keep
        # event-time order end-to-end)
        whole = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        whole = whole.sort_values(["ts", "conv_id", "turn_idx"], kind="mergesort")
        nrows = len(whole)

        if proc_mode:
            whole["_custom_timeout"] = whole["_custom_timeout"].where(
                whole["_custom_timeout"] == 0
            )
            whole["_custom_inactivity"] = np.nan
            code_ran, res, _sub = scan_chunk(
                whole, rule_attrs, init, _WALL_INF, _WALL_INF
            )
        else:
            code_ran, res, _sub = scan_chunk(
                whole, rule_attrs, init, timeout_s, inactivity_s
            )
        rid_np = whole["_rule_id"].to_numpy()
        cancel_arr = (
            whole["_rule_id"].map(cancel_map).fillna(False).to_numpy(dtype=bool)
        )
        exc = np.zeros(nrows, dtype=bool)
        for rule_id, a in rule_attrs.items():
            if not a["req_cols"]:
                continue
            m = (rid_np == rule_id).astype(bool)
            if not m.any():
                continue
            bad = np.zeros(nrows, dtype=bool)
            for c in a["req_cols"]:
                bad |= whole[c].isna().to_numpy()
            exc |= m & bad

        keep = ~(code_ran & cancel_arr)        # U3: consumed where code ran
        tag_exc = code_ran & exc               # O19: tagged where code ran

        if res.final is not None:
            creation, last, nev, eff_to, eff_in = res.final
            if proc_mode:
                n_sess = len(res.sessions)
                cap = (
                    carried_cap
                    if carried_cap is not None and n_sess == 1
                    else now + timeout_s
                )
                state.update((creation, last, int(nev), "{}", None, None, cap, now))
                state.setTimeoutDuration(
                    max(int(min(inactivity_s, cap - now) * 1000), 1)
                )
            else:
                state.update((creation, last, int(nev), "{}", eff_to, eff_in))
                state.setTimeoutTimestamp(
                    _clamped_expiry_ms(min(creation + eff_to, last + eff_in), state)
                )
        elif state.exists:
            state.remove()

        kidx = np.flatnonzero(keep)
        out = whole.iloc[kidx][out_cols].copy()
        pt = whole["parse_tags"].to_numpy(dtype=object)
        te = tag_exc[kidx]
        tags_out: list = []
        ap = tags_out.append
        for b, e in zip(pt[kidx], te):
            if b is None or len(b) == 0:
                ap(_EXC if e else _EMPTY)
            elif e:
                ap(list(b) + _EXC)
            else:
                ap(list(b))
        out["tags"] = pd.Series(tags_out, index=out.index, dtype=object)
        assert len(out.columns) == n_out
        yield out

    return fn


def replay_push_previous(
    spark,
    input_dir: str,
    cfg: PipelineConfig,
    base_path: str,
    checkpoint: str,
    groks=None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Streaming replay of ``push_previous_map_as_event`` (O16/O20).

    The pop discipline — the single live map dies on EVERY task-id change
    in arrival order (``aggregate.rb:205-208,314-320``) — is a
    GLOBAL-order property across keys: keyed ``applyInPandasWithState``
    cannot express it, because one key's state must react to OTHER keys'
    arrivals. The reference itself runs serial (``-w 1``,
    ``docs/index.asciidoc:29-30``), so the faithful streaming form is a
    serial-equivalent incremental replay: each micro-batch runs the batch
    engine's exact push_previous over (carried live map ∪ batch), appends
    the popped maps to the sinks, and carries the still-live map to the
    next batch as a resume seed (the ``aggregate_maps_path`` machinery,
    plans/resume.py). After the stream drains, the carried map is pushed
    with the ``_aggregatefinalflush`` tag (``aggregate.rb:348-351``).

    Exactly-once: sink and state writes go to ``batch_id=N`` directories
    with overwrite, and batch N reads the state of the LARGEST id < N —
    a replayed batch reconstructs from its true predecessor. State
    listing uses the local filesystem (this sandbox); on a cluster point
    ``base_path`` at a shared FS.

    Batches are assumed to arrive in event-time order (an ordered file
    source) — the same event-time-equals-arrival-order model the batch
    engine documents.
    """
    import os
    import re as _re

    from logstash_filter_aggregate_spark.operators.correlate import (
        _timeout_event,
        aggregate_sessions,
        apply_guards,
        narrow_for_correlation,
    )
    from logstash_filter_aggregate_spark.operators.sessionize import sessionize
    from logstash_filter_aggregate_spark.plans.resume import inject_seeds

    if not cfg.push_previous_map_as_event:
        raise ValueError("cfg must set push_previous_map_as_event=True")
    schema = spark.read.parquet(input_dir).schema
    state_root = f"{base_path}/_pp_state"
    seg_drop = ["_end_seg", "_gap_seg", "_age_seg", "close_kind"]

    def _latest_state(before: int) -> str | None:
        if not os.path.isdir(state_root):
            return None
        ids = [
            int(m.group(1))
            for d in os.listdir(state_root)
            if (m := _re.fullmatch(r"batch_id=(\d+)", d))
            and m and int(m.group(1)) < before
            and os.path.exists(f"{state_root}/{d}/_SUCCESS")
        ]
        return f"{state_root}/batch_id={max(ids)}" if ids else None

    def _as_open(df: DataFrame) -> DataFrame:
        return (
            df.drop(*seg_drop)
            .withColumnRenamed("_session_timeout", "map_custom_timeout")
            .withColumnRenamed("_session_inactivity", "map_custom_inactivity")
        )

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from logstash_filter_aggregate_spark.config import TASK_ID_COL

        prev = _latest_state(batch_id)
        seed = spark.read.parquet(prev) if prev else None
        classified = classify(parse(batch_df, groks or compile_groks()), cfg)
        corr = inject_seeds(narrow_for_correlation(classified, cfg), seed, cfg)
        corr = corr.where(
            F.col(TASK_ID_COL).isNotNull() & F.col("_rule_id").isNotNull()
        )
        sessions = aggregate_sessions(apply_guards(sessionize(corr, cfg), cfg), cfg)
        sessions = sessions.persist()
        try:
            completed = sessions.where(F.col("close_kind") == "end")
            inline = sessions.where(F.col("close_kind") == "custom0")
            cand = sessions.where(F.col("close_kind").isNull())
            # The carried map is the one live AFTER the batch's LAST row in
            # arrival order — i.e. the last (ts, conv_id, turn_idx) row's
            # task, and that task's ordinally-last session. creation_ts is
            # NOT a valid arrival proxy (two maps created at the same ts
            # would tie and the lexically-larger task id would wrongly be
            # carried — and then wrongly merged with its continuation).
            lr = corr.agg(
                F.max(
                    F.struct("ts", "conv_id", "turn_idx", F.col(TASK_ID_COL).alias("t"))
                ).alias("m")
            ).first()["m"]
            mseg = None
            if lr is not None:
                seg = F.struct("_end_seg", "_gap_seg", "_age_seg")
                # mseg can only be None if every row of the last task was
                # guard-excluded — impossible under push_previous configs
                # (all rules create_or_update, validated)
                mseg = (
                    sessions.where(F.col("task_id") == lr["t"])
                    .agg(F.max(seg).alias("m")).first()["m"]
                )
            if mseg is None:
                cand = cand.withColumn("_last", F.lit(False))
            else:
                # if the last row's session CLOSED (end/custom0), that seg
                # is not in cand — no live map is carried, correctly
                cand = cand.withColumn(
                    "_last",
                    (F.col("task_id") == F.lit(lr["t"]))
                    & (F.col("_end_seg") == F.lit(mseg["_end_seg"]))
                    & (F.col("_gap_seg") == F.lit(mseg["_gap_seg"]))
                    & (F.col("_age_seg") == F.lit(mseg["_age_seg"])),
                )
            pushed = _timeout_event(
                cand.where(~F.col("_last")).drop("_last"), cfg, final_col=None
            ).drop(*seg_drop, "_session_timeout", "_session_inactivity")
            pushed.write.mode("overwrite").parquet(f"{base_path}/timeout/batch_id={batch_id}")
            # completed maps pass through plain (route_sessions does not
            # run end-closed maps through the timeout-event projection)
            completed.drop(
                *seg_drop, "_session_timeout", "_session_inactivity"
            ).write.mode("overwrite").parquet(f"{base_path}/completed/batch_id={batch_id}")
            _timeout_event(inline, cfg, final_col=None).drop(
                *seg_drop, "_session_timeout", "_session_inactivity"
            ).write.mode("overwrite").parquet(f"{base_path}/inline/batch_id={batch_id}")
            _as_open(cand.where(F.col("_last")).drop("_last")).write.mode(
                "overwrite"
            ).parquet(f"{state_root}/batch_id={batch_id}")
        finally:
            sessions.unpersist()

    src = spark.readStream.schema(schema)
    if max_files_per_trigger:
        src = src.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        src.parquet(input_dir)
        .writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # final flush (O20): push the carried live map with the final tag
    last = _latest_state(1 << 62)
    final_dir = f"{base_path}/timeout/batch_id=final"
    if last is not None:
        # ALWAYS rewrite the final dir — even when no live map is carried
        # (zero rows), so an incremental re-run never leaves a previous
        # invocation's final-flush rows behind to be double-counted by
        # sink readers
        live = spark.read.parquet(last)
        sessions_like = (
            live.withColumnRenamed("map_custom_timeout", "_session_timeout")
            .withColumnRenamed("map_custom_inactivity", "_session_inactivity")
            .withColumn("_final", F.lit(True))
        )
        _timeout_event(sessions_like, cfg, final_col="_final").drop(
            "_final", "_session_timeout", "_session_inactivity"
        ).write.mode("overwrite").parquet(final_dir)
    elif os.path.isdir(final_dir):
        # no state at all this run: drop any stale final dir
        import shutil

        shutil.rmtree(final_dir, ignore_errors=True)


def replay_routed(
    spark,
    input_dir: str,
    cfg: PipelineConfig,
    base_path: str,
    checkpoint: str,
    groks=None,
    watermark: str = "10 minutes",
    final_flush: bool = True,
    shards: int | None = None,
) -> None:
    """Finite-corpus replay through the streaming engine with a FULL
    final flush — the streaming analog of the batch engine's end-of-input
    watermark routing.

    Structured Streaming only fires event-time state timeouts as the
    watermark advances with new data, so the last sessions of a finite
    replay would sit in state forever. ``final_flush=True`` writes ONE
    sentinel heartbeat row into a SIBLING staging directory
    (``{base_path}/_heartbeat_src`` — never into ``input_dir``, which
    stays byte-identical to what the caller handed in; batch re-runs
    over the same directory see no sentinel and compute their watermark
    from real data only). The stream reads the union of both
    directories; the sentinel matches no correlation rule and carries a
    far-future ``ts`` that advances the watermark past every registered
    expiry — max(timeout, inactivity, literal custom overrides) plus
    the watermark delay — so every remaining map routes to its sink,
    exactly like the batch engine's final flush. The staging dir is
    rewritten with ``overwrite`` each call, so repeated replays never
    accumulate sentinels (the horizon is always computed from the real
    corpus, not from a previous sentinel).

    **Checkpoint compatibility**: this two-source union shape is pinned
    by the checkpoint from the FIRST cycle. A checkpoint created by an
    older single-source build of this function cannot be resumed (Spark
    rejects a changed streaming-source count) — use a fresh
    ``checkpoint`` directory when upgrading; likewise delete any
    sentinel file an older build appended INSIDE ``input_dir`` (current
    builds never write there, but a leftover one would be re-read as
    data).
    """
    import re as _re

    schema = spark.read.parquet(input_dir).schema
    hb_dir = f"{base_path}/_heartbeat_src"
    # the union source must exist from the FIRST cycle: a checkpoint pins
    # the source count, so the heartbeat leg is an (initially empty)
    # parquet dir rather than a source added later
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(hb_dir)

    def _cycle() -> None:
        src = (
            spark.readStream.schema(schema).parquet(input_dir)
            .unionByName(spark.readStream.schema(schema).parquet(hb_dir))
        )
        q = stream_to_routed_sinks(
            streaming_correlate(
                src, cfg, groks=groks, watermark=watermark, shards=shards
            ),
            base_path, checkpoint,
        )
        q.awaitTermination()

    _cycle()
    if not final_flush:
        return
    # horizon: past every possible registered expiry. Non-literal custom
    # timeout expressions can register per-map expiries we cannot bound
    # statically — refuse rather than silently dropping tail sessions.
    horizons = [float(cfg.timeout), float(cfg.effective_inactivity_timeout)]
    for r in cfg.rules:
        for expr in (r.custom_timeout, r.custom_inactivity_timeout):
            if expr is None:
                continue
            if _re.fullmatch(r"\d+(\.\d+)?", expr.strip()):
                horizons.append(float(expr))
            else:
                raise ValueError(
                    f"final_flush cannot bound the flush horizon for rule "
                    f"{r.rule_id!r}: custom timeout {expr!r} is not a numeric "
                    f"literal — pass final_flush=False and flush manually, or "
                    f"use literal overrides"
                )
    m = _re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?", watermark.strip())
    if not m:
        raise ValueError(
            f"final_flush cannot parse watermark delay {watermark!r} "
            f"(expected '<n> second|minute|hour|day[s]')"
        )
    delay_s = float(m.group(1)) * {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[m.group(2)]
    max_ts = spark.read.parquet(input_dir).agg(F.max("ts")).first()[0]
    if max_ts is None:
        return  # empty corpus: no state to flush
    hb_ts = max_ts + __import__("datetime").timedelta(seconds=max(horizons) + delay_s + 1)
    # build the sentinel by FIELD NAME so any column order works; non-ts
    # string columns default to the sentinel marker, everything else NULL
    hb_vals = {}
    for f in schema.fields:
        if f.name == "ts":
            hb_vals[f.name] = hb_ts
        elif f.name == "conv_id":
            hb_vals[f.name] = HEARTBEAT_CONV
        elif f.dataType.simpleString() == "string":
            hb_vals[f.name] = "__heartbeat__"
        else:
            hb_vals[f.name] = None
    hb = spark.createDataFrame([tuple(hb_vals[f.name] for f in schema.fields)], schema)
    hb.coalesce(1).write.mode("overwrite").parquet(hb_dir)
    # two cycles: the heartbeat batch advances the watermark at its END,
    # and state timers registered against the old watermark fire in the
    # NEXT batch (a restart on the same checkpoint runs one batch that
    # applies the checkpointed watermark to state even with no new data)
    _cycle()
    _cycle()

"""Task-instance sessionization (SURVEY.md O8/O9/O10/O12).

The reference's map lifecycle — create on first event, delete on
``end_of_task`` (``aggregate.rb:240``), expire on inactivity gap or
absolute age when the next event of the task arrives
(``aggregate.rb:420-445``) — becomes window expressions over the task
partition.

Scale invariant: EVERY window here partitions by ``_task_id`` alone and
shares one sort order, so the whole stage runs on a single exchange +
sort (one shuffle of the event stream). Finer-grained state (per-segment
creation time, per-segment guard counts) is recovered with the
"running latest group-start" trick — ``max(when(group_start,
struct(ord, v)))`` over the running frame — which is legal because
segments are contiguous runs in task order, and age-cap crossings are
suffix-monotone within a segment (ts is non-decreasing, so
``ts - creation > timeout`` flips once). This is what replaces the
reference's global mutex + ``-w 1`` worker (``docs/index.asciidoc:29-30``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.config import ORDER_COL, TASK_ID_COL, PipelineConfig

# Total order within a task partition: event time first (the reference's
# arrival order under the deterministic event-time mode, spec:374-390),
# then (conv_id, turn_idx) as the stable tiebreak (SURVEY.md §7 hard pt 4).
ORDER_BY = ["ts", "conv_id", "turn_idx"]


def _w():
    return W.partitionBy(TASK_ID_COL).orderBy(*ORDER_BY)


def _running(col: Column) -> Column:
    return col.over(_w().rowsBetween(W.unboundedPreceding, 0))


def _ts_sec() -> Column:
    return F.col("ts").cast("timestamp").cast("double")  # microsecond-precise


def sessionize(classified: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Add ``_ord``, ``_end_seg``, ``_gap_seg``, ``_age_seg`` to rows that
    participate in correlation. Single task-partition exchange (plus one
    range exchange when ``push_previous_exact`` needs the global index)."""
    part = classified.where(
        F.col(TASK_ID_COL).isNotNull() & F.col("_rule_id").isNotNull()
    )

    # statically no rule can close a map (no end_of_task rows, no
    # custom_timeout expression that could evaluate to 0): _close_flag
    # and _end_seg are provably constant 0 — skip their running-sum
    # window and drop _end_seg from every lag check downstream (the
    # docs-example-#3 shape: click counting with timeout push)
    no_closes = not any(r.end_of_task for r in cfg.rules) and all(
        r.custom_timeout is None for r in cfg.rules
    )
    close_flag = (
        F.lit(0)
        if no_closes
        else ((F.col("_end_flag") == 1) | (F.col("_custom_timeout") == 0.0)).cast("int")
    )
    part = part.withColumn("_close_flag", close_flag)

    if cfg.exact_age_cap and cfg.timeout_timestamp_field is not None:
        # Window-free exact path: the per-task scan sorts its group in
        # pandas anyway and its session-hop subsumes every split, so the
        # pre-scan JVM window pass is pure waste — `_gap_seg` was
        # computed and then ZEROED by the scan, and `_ord`/`_end_seg`
        # are one arange/cumsum on the scan's own sorted arrays. Removing
        # it drops the window sort + window eval of the whole event
        # stream from the (single-task-per-hot-task) stage; the one
        # exchange the stage needs now comes from the applyInPandas
        # grouping itself. (push_previous_exact+exact_age_cap is
        # rejected by config validation, and processing-time mode never
        # reaches exact mode, so no run-break/proc-time interplay here.)
        return _exact_age_seg(part, cfg)

    if cfg.push_previous_exact:
        # exact interleaved push_previous (O16 strict mode): a map also
        # dies when ANOTHER task's event arrives between two of its own —
        # i.e. when consecutive same-task rows are not adjacent in the
        # GLOBAL order. operators/order.py supplies the index without a
        # partition-less window.
        from logstash_filter_aggregate_spark.operators.order import with_global_index

        part = with_global_index(part, ORDER_BY)

    w = _w()
    part = part.withColumn(ORDER_COL, F.row_number().over(w))
    # segment splits AFTER a close row: count closes strictly before me
    part = part.withColumn(
        "_end_seg",
        F.lit(0)
        if no_closes
        else F.coalesce(
            F.sum("_close_flag").over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("int"),
    )

    run_break = None
    if cfg.push_previous_exact:
        prev_g = F.lag("_gidx").over(w)
        run_break = (prev_g.isNotNull() & (F.col("_gidx") - prev_g > 1)).cast("int")

    if cfg.timeout_timestamp_field is None:
        # processing-time mode: no wall clock passes during a batch replay
        # (config.py PipelineConfig docs) — only end/custom0 closes and
        # push_previous run breaks (not time-based) split
        if run_break is not None:
            part = part.withColumn(
                "_gap_seg",
                F.coalesce(_running(F.sum(F.coalesce(run_break, F.lit(0)))), F.lit(0)).cast("int"),
            ).drop("_gidx")
        else:
            part = part.withColumn("_gap_seg", F.lit(0))
        return part.withColumn("_age_seg", F.lit(0))

    inactivity = float(cfg.effective_inactivity_timeout)
    ts_sec = _ts_sec()
    # partial rows (resume seeds / skew pre-reduction super-rows) span
    # [ts, _seed_lastevent_ts]; the gap to the NEXT row measures from
    # their last event, not their arrival position
    if "_seed_lastevent_ts" in part.columns:
        eff_last = F.coalesce(
            F.col("_seed_lastevent_ts").cast("timestamp").cast("double"), ts_sec
        )
    else:
        eff_last = ts_sec
    gap_core = ts_sec - F.lag(eff_last).over(w) > F.lit(inactivity)
    if no_closes:
        # _end_seg is constant 0: same-segment is trivially true, and the
        # first row's lag(eff_last) NULL already nulls the comparison
        gap_flag = gap_core.cast("int")
    else:
        same_end = F.lag("_end_seg").over(w) == F.col("_end_seg")
        gap_flag = (same_end & gap_core).cast("int")
    if run_break is not None:
        # a push_previous run break pops the map exactly like
        # expiry-on-arrival — fold it into the gap split
        gap_flag = F.greatest(gap_flag, run_break)
    # non-resetting cumulative count: ids only need to be unique within
    # (task, end_seg), which a task-wide running sum already is
    part = part.withColumn(
        "_gap_seg",
        F.coalesce(_running(F.sum(F.coalesce(gap_flag, F.lit(0)))), F.lit(0)).cast("int"),
    )
    if run_break is not None:
        part = part.drop("_gidx")

    return _window_age_seg(part, cfg, passes=2, no_closes=no_closes)


def seg_start_flag(with_end_seg: bool = True, with_age_seg: bool = True) -> Column:
    """True on the first row of a (end, gap, age) segment — lag-based, so
    it stays on the single task-partition window. Callers that can prove
    a component constant (``_end_seg`` when no rule closes, ``_age_seg``
    on the first age pass) drop its lag from the check — each flag saves
    one window-function evaluation per row."""
    w = _w()
    cols = ["_gap_seg"]
    if with_end_seg:
        cols.insert(0, "_end_seg")
    if with_age_seg:
        cols.append("_age_seg")
    changed = F.lag(cols[0]).over(w).isNull()  # first row of the task
    for c in cols:
        changed = changed | (F.lag(c).over(w) != F.col(c))
    return changed


def _window_age_seg(
    part: DataFrame, cfg: PipelineConfig, passes: int, no_closes: bool = False
) -> DataFrame:
    """Iterated suffix split: within a segment ``ts - creation > timeout``
    is monotone in the row order, so each pass moves the crossed suffix
    into a new generation; pass *p* is exact when a segment age-splits at
    most *p* times. Strict comparison matches the reference's
    ``creation + timeout < now`` (``aggregate.rb:396``). All passes stay
    on the single task-partition window."""
    timeout = float(cfg.timeout)
    ts_sec = _ts_sec()
    # a resume seed row carries the prior run's true creation time; the map
    # ages from THAT, not from the seed's position ts (= prior lastevent_ts)
    # — otherwise a resumed map whose absolute timeout crosses during this
    # run splits late and resume(chunk2, open(chunk1)) diverges from the
    # single full run (the invariant plans/resume.py documents as tested).
    if "_seed_creation_ts" in part.columns:
        creation_src = F.coalesce(
            F.col("_seed_creation_ts").cast("timestamp").cast("double"), ts_sec
        )
    else:
        creation_src = ts_sec
    part = part.withColumn("_age_seg", F.lit(0))
    for p in range(passes):
        # pass 0 sees the constant initial _age_seg — skip its lag; and
        # with no closing rules _end_seg is constant 0 in every pass
        grp_start = seg_start_flag(with_end_seg=not no_closes, with_age_seg=p > 0)
        creation = _running(
            F.max(F.when(grp_start, F.struct(F.col(ORDER_COL).alias("o"), creation_src.alias("t"))))
        )["t"]
        crossed = ts_sec - creation > F.lit(timeout)
        part = part.withColumn(
            "_age_seg",
            (F.col("_age_seg") * 2 + F.when(crossed, 1).otherwise(0)).cast("int"),
        )
    return part


def _exact_age_seg(part: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Exact per-task scan via applyInPandas (SURVEY.md §7 hard part 1).

    Two tiers inside the scan:

    - **fast path** (the common shape — every row ``create_or_update``,
      no per-map overrides): session-hop with numpy ``searchsorted``. Each
      session's end is found in O(log n) — the next inactivity gap from a
      precomputed flag array, the next age crossing by binary search on
      the sorted ``ts`` — so work is O(#sessions · log n), not O(rows).
      A 1M-row hot task with a handful of sessions costs a handful of
      hops instead of a million interpreted iterations.
    - **guarded / override tiers** (tasks with ``create``/``update``
      guard actions or live per-map overrides): the same vectorized
      session-hop, extended to reproduce the reference's filter hot path
      (``aggregate.rb:179-246``) exactly, including the orderings the
      window mode approximates: the expiry check runs *before* the
      map-action guard (``aggregate.rb:194-199``), a duplicate
      ``create`` returns before touching ``lastevent_timestamp``
      (``aggregate.rb:216`` precedes ``:220``) so it must NOT refresh the
      inactivity clock, and an ``update`` with no live map is a total
      no-op (``aggregate.rb:203``) that neither creates nor refreshes.
      Every tier is fuzz-pinned against an independent per-row reference
      simulator (``tests/test_timeouts.py::_reference_scan``).

    Groups are single tasks — bounded by the reference's own working-set
    assumption (one in-memory map per task, warning at 5000 maps,
    ``aggregate.rb:499-516``). Resume seed rows age from their carried
    ``_seed_creation_ts``, not their injection position.
    """
    timeout = float(cfg.timeout)
    inactivity = float(cfg.effective_inactivity_timeout)
    out_schema = part.withColumns(
        {
            ORDER_COL: F.lit(0).cast("int"),
            "_end_seg": F.lit(0).cast("int"),
            "_gap_seg": F.lit(0).cast("int"),
            "_age_seg": F.lit(0).cast("int"),
        }
    ).schema
    has_seed_cols = "_seed_creation_ts" in part.columns

    import numpy as np

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        # sort_values returns a fresh frame — safe to assign columns on
        # directly (the former extra .copy() doubled the group's memory
        # traffic for nothing)
        pdf = pdf.sort_values(["ts", "conv_id", "turn_idx"], kind="mergesort")
        ts = pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy() / 1e9
        n = len(pdf)
        # _ord / _end_seg on the scan's own sorted arrays (same task-local
        # total order the window pass produced): row number, and the count
        # of close rows strictly before me
        close = pdf["_close_flag"].to_numpy(dtype="int64", na_value=0)
        end_seg = np.zeros(n, dtype="int64")
        if n > 1:
            np.cumsum(close[:-1], out=end_seg[1:])
        cust_to = pdf["_custom_timeout"].to_numpy(dtype="float64", na_value=np.nan)
        cust_in = pdf["_custom_inactivity"].to_numpy(dtype="float64", na_value=np.nan)
        age = np.zeros(n, dtype="int32")
        action = pdf["_action"].to_numpy() if "_action" in pdf.columns else None
        seed_creation = None
        if has_seed_cols:
            s = pdf["_seed_creation_ts"].astype("datetime64[ns]")
            mask = s.isna().to_numpy()
            sc = s.fillna(pd.Timestamp(0)).astype("int64").to_numpy() / 1e9
            sc[mask] = np.nan
            seed_creation = sc
        all_cou = action is None or bool((action == "create_or_update").all())
        no_overrides = not (np.nan_to_num(cust_to) > 0).any() and not (
            np.nan_to_num(cust_in) > 0
        ).any()
        # seeds (finite _seed_creation_ts, at ANY position — overlapping
        # resumes inject several per task) ride through every tier: a seed
        # only perturbs the session whose CREATOR is the seed row, one
        # scalar lookup per session start in the hop loops
        if all_cou and no_overrides and n > 0:
            _fast_scan(ts, end_seg, seed_creation, age, timeout, inactivity)
        elif no_overrides and n > 0:
            # guarded (create/update actions) but no live overrides: the
            # vectorized session-hop still applies (tier B)
            _guarded_scan(ts, end_seg, action, seed_creation, age, timeout, inactivity)
        elif n > 0:
            # live per-map overrides (tier C): session-hop with override
            # regimes. Every-row constant overrides (a rule that always
            # sets the same map_meta timeout) collapse to tier B with
            # substituted clocks — the creator applies the override at
            # session start, so the whole session runs on it.
            if action is None:
                action = np.full(n, "create_or_update", dtype=object)
            eff = _constant_override_clocks(cust_to, cust_in, timeout, inactivity)
            if eff is not None:
                _guarded_scan(ts, end_seg, action, seed_creation, age, eff[0], eff[1])
            else:
                _override_scan(
                    ts, end_seg, action, cust_to, cust_in, seed_creation, age,
                    timeout, inactivity,
                )
        pdf[ORDER_COL] = np.arange(1, n + 1, dtype="int32")
        pdf["_end_seg"] = end_seg.astype("int32")
        # exact mode folds gap splits into _age_seg; zero _gap_seg so the
        # aggregate stage's (end, gap, age) grouping key stays uniform
        pdf["_gap_seg"] = np.zeros(n, dtype="int32")
        pdf["_age_seg"] = age
        return pdf

    return part.groupBy(TASK_ID_COL).applyInPandas(scan, schema=out_schema)


def _seed_or_ts(seed_creation, s: int, ts) -> float:
    """Session creation time at creator row ``s``: the row's carried
    ``_seed_creation_ts`` when finite (a resume seed re-creating a prior
    run's map, at any position — overlapping resumes inject several per
    task), else the row's own ts. One scalar lookup per session start."""
    if seed_creation is not None:
        sc = seed_creation[s]
        if sc == sc:  # non-NaN
            return float(sc)
    return float(ts[s])


def _fast_scan(ts, end_seg, seed_creation, age, timeout: float, inactivity: float) -> None:
    """All-create_or_update, no-override session-hop scan: splits per
    end_seg block; within a block, each session's end is found via numpy
    searchsorted (next precomputed inactivity gap / next age crossing), so
    work is O(#sessions · log n) instead of O(rows) interpreted Python."""
    import numpy as np

    n = len(ts)
    # gap-split candidates: rows whose delta to the previous row exceeds
    # the inactivity timeout (strict >, aggregate.rb:397)
    gap_rows = np.flatnonzero(np.diff(ts) > inactivity) + 1
    block_starts = np.concatenate(
        ([0], np.flatnonzero(end_seg[1:] != end_seg[:-1]) + 1, [n])
    )
    for bi in range(len(block_starts) - 1):
        s, e = int(block_starts[bi]), int(block_starts[bi + 1])
        cur = 0
        start = s
        while start < e:
            creation = _seed_or_ts(seed_creation, start, ts)
            # next inactivity gap strictly after the session start
            gi = np.searchsorted(gap_rows, start + 1)
            g = int(gap_rows[gi]) if gi < len(gap_rows) else e
            # next absolute-age crossing: first row with ts > creation+timeout
            a = start + 1 + int(
                np.searchsorted(ts[start + 1 : e], creation + timeout, side="right")
            )
            nxt = min(g, a, e)
            age[start:nxt] = cur
            cur += 1
            start = nxt


def _guarded_scan(ts, end_seg, action, seed_creation, age, timeout: float, inactivity: float) -> None:
    """Guarded (create/update actions) session-hop scan — the vectorized
    tier between ``_fast_scan`` and ``_override_scan``, valid when no
    per-map overrides are live. Same O(#sessions · log n) hop structure,
    extended with the guard semantics the reference's per-row state
    machine preserves (see ``_exact_age_seg``):

    - a duplicate ``create`` neither refreshes the inactivity clock nor
      re-creates (``aggregate.rb:216`` precedes ``:220``), so the gap
      measures from the last non-``create`` row of the session;
    - an ``update`` with no live map is a no-op (``aggregate.rb:203``)
      that cannot start a session — after a death, the next map starts at
      the next can-create row;
    - expiry-on-arrival still runs for every matched row, including rows
      the guard will then reject (``aggregate.rb:194-199``).

    Gap candidates are precomputed against ``prevref`` (last non-create
    row before me). Inside a session the candidate set is exact past the
    session's initial create-run (prevref then points inside the session)
    and a superset within it (stale prevref only overestimates the gap),
    so the run is re-checked directly against the session start — a
    binary search over a usually-tiny range.
    """
    import numpy as np

    n = len(ts)
    # .astype(bool) re-materializes the comparison result contiguously:
    # np.where over the raw object-comparison output runs ~25x slower
    # (measured 74ms vs 3ms per 1M rows on this box)
    nonref = (action == "create").astype(bool)
    is_update = (action == "update").astype(bool)
    # last-refresh ts before each row: ts is non-decreasing, so the LAST
    # refreshing row's ts equals the running MAX of refresh-row ts — a
    # single accumulate, no index gather
    ref_ts = np.where(nonref, -np.inf, ts)
    run = np.maximum.accumulate(ref_ts)
    gap_flag = np.zeros(n, dtype=bool)
    if n > 1:
        gap_flag[1:] = (ts[1:] - run[:-1] > inactivity) & np.isfinite(run[:-1])
    gap_rows = np.flatnonzero(gap_flag)
    cc_rows = np.flatnonzero(~is_update)           # can-create rows
    nonref_rows = np.flatnonzero(~nonref)          # rows that refresh `last`
    block_starts = np.concatenate(
        ([0], np.flatnonzero(end_seg[1:] != end_seg[:-1]) + 1, [n])
    )

    # bound methods: the hop loop runs once per session — keep its body
    # free of np.* wrapper overhead (measurable at ~3k sessions/task)
    gap_ss, n_gap = gap_rows.searchsorted, len(gap_rows)
    cc_ss, n_cc = cc_rows.searchsorted, len(cc_rows)
    nr_ss, n_nr = nonref_rows.searchsorted, len(nonref_rows)

    for bi in range(len(block_starts) - 1):
        s0, e = int(block_starts[bi]), int(block_starts[bi + 1])
        cur = 0
        ci = cc_ss(s0)
        s = int(cc_rows[ci]) if ci < n_cc and cc_rows[ci] < e else e
        age[s0:s] = cur
        while s < e:
            creation = _seed_or_ts(seed_creation, s, ts)
            # initial create-run: rows (s, ncr] still measure the gap from
            # ts[s] (nothing refreshed `last` yet)
            ri = nr_ss(s + 1)
            ncr = int(nonref_rows[ri]) if ri < n_nr and nonref_rows[ri] < e else e
            if ncr == s + 1 or s + 1 >= e:
                # common shape: the next row already refreshes `last`, so
                # the run check degenerates to one comparison
                g_run = s + 1 if (s + 1 < e and ts[s + 1] - ts[s] > inactivity) else e
            else:
                # rare multi-row create-run: binary search on the run view
                hi = min(ncr + 1, e)
                g_run = s + 1 + int(ts[s + 1 : hi].searchsorted(ts[s] + inactivity, "right"))
                if g_run >= hi:
                    g_run = e
            gi = gap_ss((ncr if ncr > s else s) + 1)
            g_flag = int(gap_rows[gi]) if gi < n_gap and gap_rows[gi] < e else e
            a = s + 1 + int(ts[s + 1 : e].searchsorted(creation + timeout, "right"))
            b = min(g_run, g_flag, a, e)
            age[s:b] = cur
            if b >= e:
                break
            # the map dies on row b's arrival; the next map starts at the
            # next can-create row (no-op updates in between share the new
            # generation label, exactly like the per-row replay)
            cur += 1
            ci = cc_ss(b)
            s = int(cc_rows[ci]) if ci < n_cc and cc_rows[ci] < e else e
            age[b:s] = cur


def _constant_override_clocks(cust_to, cust_in, timeout, inactivity):
    """If EVERY row carries the same (>0) override value — or none does —
    for each clock, the override semantics reduce to running the guarded
    scan with substituted defaults: every session's creator runs the code
    and applies the override at creation, so no session ever runs on the
    pattern default. Returns ``(eff_timeout, eff_inactivity)`` or None
    when the reduction doesn't apply."""
    import numpy as np

    out = []
    for arr, dflt in ((cust_to, timeout), (cust_in, inactivity)):
        live = np.isfinite(arr) & (arr > 0)
        if not live.any():
            out.append(dflt)
        elif live.all() and (arr == arr[0]).all():
            out.append(float(arr[0]))
        else:
            return None
    return tuple(out)


def _override_scan(
    ts, end_seg, action, cust_to, cust_in, seed_creation, age,
    timeout: float, inactivity: float,
) -> None:
    """Vectorized session-hop for tasks with LIVE per-map overrides
    (``map_meta.timeout``/``inactivity_timeout``, O17) — the tier that
    was per-row interpreted Python through round 3.

    Overrides are last-write-wins scalars applied only where the code
    runs (``aggregate.rb:243-246``), so a session decomposes into
    REGIMES of constant ``(eff_to, eff_in)`` delimited by non-``create``
    override rows (a duplicate ``create`` never runs the code, so it can
    neither refresh nor override). Per regime the next event is found
    with numpy primitives:

    - age crossing: binary search on the sorted ``ts`` for
      ``creation + eff_to``;
    - gap crossing: ``ts[i] - max(run_prev[i], last) > eff_in`` (with
      ``run_prev`` the global running max of non-create row ts; stale
      values from before the session floor out against the scalar
      ``last``) factors into two sorted-searchable conditions —
      ``ts[i] - run_prev[i] > eff_in`` is ROW-STATIC per ``eff_in``
      value, so its crossing rows are precomputed once per distinct
      effective inactivity (memoized, slice-scan fallback past 8
      distinct values), and ``ts[i] > last + eff_in`` is a binary
      search on the sorted ``ts``. The expiry check runs for every
      arriving row, including rows the guard then rejects
      (``aggregate.rb:194-199``);
    - next override row: binary search in the precomputed non-create
      override index array; rows re-asserting the values already in
      effect are skipped wholesale when each clock's override values are
      globally constant (the common "rule always sets the same
      map_meta.timeout" shape).

    Python-level work is O(#sessions + #effective override rows); the
    vectorized gap scans sum to O(rows) bandwidth. Fuzz-equivalent to
    the per-row replay (tests/test_timeouts.py override fuzz family).
    """
    import numpy as np

    n = len(ts)
    is_create = (action == "create").astype(bool)  # see _guarded_scan note
    is_update = (action == "update").astype(bool)
    has_to = np.isfinite(cust_to) & (cust_to > 0)
    has_in = np.isfinite(cust_in) & (cust_in > 0)
    # global running max of non-create ts: the refresh clock candidates
    run = np.maximum.accumulate(np.where(is_create, -np.inf, ts))
    run_prev = np.empty(n)
    run_prev[0] = -np.inf
    run_prev[1:] = run[:-1]
    gap_margin = ts - run_prev

    cc_rows = np.flatnonzero(~is_update)               # can-create rows
    cc_ss, n_cc = cc_rows.searchsorted, len(cc_rows)

    def next_cc(i: int) -> int:
        k = cc_ss(i)
        return int(cc_rows[k]) if k < n_cc else n
    # constant-where-present override values (per clock): lets the hop
    # skip override rows once the value is already in effect
    to_vals = cust_to[has_to]
    const_to = float(to_vals[0]) if len(to_vals) and bool((to_vals == to_vals[0]).all()) else None
    in_vals = cust_in[has_in]
    const_in = float(in_vals[0]) if len(in_vals) and bool((in_vals == in_vals[0]).all()) else None
    no_to, no_in = not len(to_vals), not len(in_vals)

    ts_ss = ts.searchsorted
    # Override EVENTS as plain python lists (row, to_val|None, in_val|None):
    # the hop loop visits an event only when it could CHANGE the effective
    # clocks — a re-assertion of the value already in effect is skipped in
    # ~100ns of pure-python pointer walk. Refreshes of the inactivity
    # clock need no visit at all: `last` before row i is
    # max(run_prev[i], ts[session creator]) — run_prev already carries
    # every later non-create refresh — so the dynamic gap threshold is
    # session-static per eff_in.
    ev_rows_arr = np.flatnonzero((has_to | has_in) & ~is_create)
    ev_rows: list = ev_rows_arr.tolist()
    _cto = cust_to[ev_rows_arr]
    _cin = cust_in[ev_rows_arr]
    _hto = has_to[ev_rows_arr]
    _hin = has_in[ev_rows_arr]
    ev_vals: list = [
        (
            float(_cto[k]) if _hto[k] else None,
            float(_cin[k]) if _hin[k] else None,
        )
        for k in range(len(ev_rows))
    ]
    n_ev = len(ev_rows)
    from bisect import bisect_right

    # first-crossing rows of the row-static half of the gap condition,
    # per distinct effective inactivity (bounded memo; rare configs with
    # many distinct override values fall back to a direct flatnonzero).
    # Each entry: (rows array, row-position searchsorted, ts[rows]
    # searchsorted, count).
    gap_cache: dict = {}

    def _gap_rows(eff):
        hit = gap_cache.get(eff)
        if hit is None:
            r = np.flatnonzero(gap_margin > eff)
            hit = (r, r.searchsorted, ts[r].searchsorted, len(r))
            if len(gap_cache) < 8:
                gap_cache[eff] = hit
        return hit

    block_starts = np.concatenate(
        ([0], np.flatnonzero(end_seg[1:] != end_seg[:-1]) + 1, [n])
    )

    for bi in range(len(block_starts) - 1):
        s0, e = int(block_starts[bi]), int(block_starts[bi + 1])
        cur = 0
        s = next_cc(s0) if s0 < n else n
        if s > e:
            s = e
        age[s0:s] = cur                                # leading no-map updates
        while s < e:
            creation = _seed_or_ts(seed_creation, s, ts)
            last_floor = float(ts[s])
            eff_to, eff_in = timeout, inactivity
            if has_to[s]:
                eff_to = float(cust_to[s])             # creator runs the code
            if has_in[s]:
                eff_in = float(cust_in[s])
            age[s] = cur
            p = s
            ei = bisect_right(ev_rows, s)              # first event after creator
            a_raw = int(ts_ss(creation + eff_to, "right"))
            a_eff_to = eff_to                          # value a_raw was computed for
            g_rows, g_pos_ss, g_ts_ss, g_n = _gap_rows(eff_in)
            gi_dyn = int(g_ts_ss(last_floor + eff_in, "right"))
            g_eff_in = eff_in
            clocks_final = (no_to or eff_to == const_to) and (no_in or eff_in == const_in)
            while True:
                # next event that would CHANGE a clock (skips are ~100ns)
                if clocks_final:
                    o = e
                    ei = n_ev
                else:
                    o = e
                    while ei < n_ev:
                        r = ev_rows[ei]
                        if r >= e:
                            break
                        tv, iv = ev_vals[ei]
                        if (tv is not None and tv != eff_to) or (
                            iv is not None and iv != eff_in
                        ):
                            o = r
                            break
                        ei += 1
                if eff_to != a_eff_to:
                    a_raw = int(ts_ss(creation + eff_to, "right"))
                    a_eff_to = eff_to
                if eff_in != g_eff_in:
                    g_rows, g_pos_ss, g_ts_ss, g_n = _gap_rows(eff_in)
                    gi_dyn = int(g_ts_ss(last_floor + eff_in, "right"))
                    g_eff_in = eff_in
                a = a_raw if a_raw > p else p + 1
                hi = min(a, o + 1, e)                  # gap check includes o itself
                g = e + 1
                if p + 1 < hi:
                    gi = int(g_pos_ss(p + 1))
                    if gi_dyn > gi:
                        gi = gi_dyn
                    if gi < g_n:
                        gr = int(g_rows[gi])
                        if gr < hi:
                            g = gr
                d = a if a < g else g
                if d <= o and d < e:
                    # map dies on row d's arrival (expiry runs before the
                    # guard and before any override application)
                    age[p + 1 : d] = cur
                    cur += 1
                    s = next_cc(d)
                    if s > e:
                        s = e
                    age[d:s] = cur
                    break
                if o < e:
                    # event survives its own expiry check: the code runs —
                    # apply the last-write-wins override
                    age[p + 1 : o + 1] = cur
                    tv, iv = ev_vals[ei]
                    if tv is not None:
                        eff_to = tv
                    if iv is not None:
                        eff_in = iv
                    ei += 1
                    p = o
                    clocks_final = (no_to or eff_to == const_to) and (
                        no_in or eff_in == const_in
                    )
                    continue
                age[p + 1 : e] = cur                   # session runs to block end
                s = e
                break



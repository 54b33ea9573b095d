"""Vectorized per-key state walk for the streaming gated tiers.

The keyed stateful functions in :mod:`streaming.stream` replay the
reference's filter hot path (``aggregate.rb:179-246``) over one task's
micro-batch. Through round 4 that replay was a per-row interpreted
Python loop (~1 s per million rows on a hot key, one task slot). This
module runs the identical state machine as a numpy session-hop — the
same regime-hop structure as the batch exact tiers
(``operators/sessionize.py``), extended with what a micro-batch walk
needs:

- a **carried state cell** entering the scan (creation / lastevent /
  nevents / effective clocks from previous micro-batches);
- **dynamic closes**: ``end_of_task`` and ``map_meta.timeout = 0``
  fire only where the codeblock runs (a duplicate ``create`` never
  runs it), so they cannot be precomputed as static segment splits
  the way the batch engine's ``_end_seg`` is;
- per-row ``code_ran`` labels and per-session close records coming
  out — the streaming outputs are passthrough rows and closed maps,
  not generation labels.

Python-level work is O(#sessions + #override events + #closes), each
step O(log n); every per-row computation is numpy. Fuzz-pinned against
an independent per-row reference simulator
(``tests/test_streaming_walk.py``) and by the engine-level streaming
batch-equality tests.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

# session close kinds
END = "end"        # end_of_task rule row closed the map (aggregate.rb:240)
CT0 = "ct0"        # map_meta.timeout = 0 instant eviction (aggregate.rb:259-274)
EXPIRY = "expiry"  # event-time expiry on arrival (aggregate.rb:194-199)
OPEN = "open"      # survives the micro-batch -> state cell


def prep_rule_arrays(whole, rule_attrs: dict):
    """Extract the walk_scan input arrays from one sorted micro-batch
    chunk. ``rule_attrs``: rule_id -> dict(map_action, end_of_task,
    has_custom_timeout, has_custom_inactivity). Returns
    ``(known, ts_s, is_create, is_update, end_flag, ct, ci)`` — rows
    whose ``_rule_id`` is not in ``rule_attrs`` have ``known`` False
    and must be excluded from the scan (they are transparent: no state
    effect, passed through untouched)."""
    rid = whole["_rule_id"]
    act = rid.map({r: a["map_action"] for r, a in rule_attrs.items()})
    known = act.notna().to_numpy(dtype=bool)
    is_create = (act == "create").to_numpy(dtype=bool)
    is_update = (act == "update").to_numpy(dtype=bool)
    end_flag = (
        rid.map({r: a["end_of_task"] for r, a in rule_attrs.items()})
        .fillna(False).to_numpy(dtype=bool)
    )
    ts_s = whole["ts"].astype("datetime64[ns]").astype("int64").to_numpy() / 1e9
    nan = np.nan
    gate_to = (
        rid.map({r: a["has_custom_timeout"] for r, a in rule_attrs.items()})
        .fillna(False).to_numpy(dtype=bool)
    )
    gate_in = (
        rid.map({r: a["has_custom_inactivity"] for r, a in rule_attrs.items()})
        .fillna(False).to_numpy(dtype=bool)
    )
    ct = np.where(
        gate_to, whole["_custom_timeout"].to_numpy(dtype="float64", na_value=nan), nan
    )
    ci = np.where(
        gate_in, whole["_custom_inactivity"].to_numpy(dtype="float64", na_value=nan), nan
    )
    return known, ts_s, is_create, is_update, end_flag, ct, ci


def scan_chunk(whole, rule_attrs: dict, init, timeout: float, inactivity: float):
    """prep + walk_scan with unknown-rule rows made transparent: returns
    ``(code_ran_full, result)`` where ``code_ran_full`` is aligned to
    ``whole`` (False on unknown-rule rows) and ``result.sess_id`` /
    session records are aligned to the KNOWN subset when one exists."""
    known, ts_s, is_create, is_update, end_flag, ct, ci = prep_rule_arrays(
        whole, rule_attrs
    )
    if known.all():
        res = walk_scan(ts_s, is_create, is_update, end_flag, ct, ci,
                        init, timeout, inactivity)
        return res.code_ran, res, None
    idx = np.flatnonzero(known)
    res = walk_scan(ts_s[idx], is_create[idx], is_update[idx], end_flag[idx],
                    ct[idx], ci[idx], init, timeout, inactivity)
    code_ran = np.zeros(len(whole), dtype=bool)
    code_ran[idx] = res.code_ran
    return code_ran, res, idx


class WalkResult:
    """Plain result bundle (no dataclass import churn in the hot path)."""

    __slots__ = ("code_ran", "sess_id", "sessions", "nevents", "final")

    def __init__(self, code_ran, sess_id, sessions, nevents, final):
        self.code_ran = code_ran    # bool[n]: the codeblock ran for this row
        self.sess_id = sess_id      # int32[n]: session index, -1 where code didn't run
        self.sessions = sessions    # list[(creation, last_ts, kind, close_row)]
        self.nevents = nevents      # int64[#sessions], carried base included
        self.final = final          # (creation, last, nevents, eff_to, eff_in) | None


def walk_scan(
    ts: np.ndarray,
    is_create: np.ndarray,
    is_update: np.ndarray,
    end_flag: np.ndarray,
    cust_to: np.ndarray,
    cust_in: np.ndarray,
    init: tuple | None,
    timeout: float,
    inactivity: float,
) -> WalkResult:
    """Run the reference state machine over one sorted task chunk.

    Parameters: ``ts`` epoch-seconds (non-decreasing), ``is_create`` /
    ``is_update`` guard-action flags, ``end_flag`` end_of_task rows,
    ``cust_to`` / ``cust_in`` per-row override values (NaN = none;
    ``cust_to == 0`` is the instant-eviction marker), ``init`` the
    carried state ``(creation, last, nevents, eff_to, eff_in)`` or
    None, and the pattern-default clocks.

    Semantics reproduced exactly (see ``_reference_scan`` in
    tests/test_timeouts.py and the per-row walk this replaced):
    expiry-on-arrival runs before the guard; a duplicate ``create``
    neither refreshes the gap clock nor runs the codeblock; an
    ``update`` with no live map is a total no-op; overrides are
    last-write-wins where the codeblock runs; ``end_of_task`` /
    ``timeout=0`` close only where the codeblock runs.
    """
    n = len(ts)
    code_ran = np.zeros(n, dtype=bool)
    sess_id = np.full(n, -1, dtype=np.int32)
    sessions: list[tuple] = []
    final = None

    if n == 0:
        nev = np.zeros(0, dtype="int64")
        if init is not None:
            c0, l0, nv0, et0, ei0 = init
            sessions.append((float(c0), float(l0), OPEN, -1))
            final = (float(c0), float(l0), int(nv0), float(et0), float(ei0))
            nev = np.asarray([int(nv0)], dtype="int64")
        return WalkResult(code_ran, sess_id, sessions, nev, final)

    is_cc = ~is_update                       # can-create rows
    cc_rows = np.flatnonzero(is_cc)
    cc_ss, n_cc = cc_rows.searchsorted, len(cc_rows)

    def next_cc(i: int) -> int:
        k = cc_ss(i)
        return int(cc_rows[k]) if k < n_cc else n

    # running max of non-create row ts: the gap-clock refresh candidates.
    # Rows that never ran the code (no-map updates between sessions) are
    # included but harmless: their ts <= the next session creator's ts,
    # so max(run_prev, last_floor) floors them out.
    run = np.maximum.accumulate(np.where(is_create, -np.inf, ts))
    run_prev = np.empty(n)
    run_prev[0] = -np.inf
    run_prev[1:] = run[:-1]
    gap_margin = ts - run_prev

    has_to = np.isfinite(cust_to) & (cust_to > 0)
    has_in = np.isfinite(cust_in) & (cust_in > 0)
    ct0 = cust_to == 0.0                     # NaN compares False
    # close candidates while a map is live: end rows always (end+create is
    # rejected at config time), timeout=0 rows only when not a duplicate
    # create (the codeblock must run for the eviction to fire)
    close_cand = (end_flag | ct0) & ~is_create
    close_rows = np.flatnonzero(close_cand)
    cl_ss, n_cl = close_rows.searchsorted, len(close_rows)

    ts_ss = ts.searchsorted
    # override EVENTS (non-create rows carrying a live override value):
    # visited only when they could change the effective clocks
    ev_rows_arr = np.flatnonzero((has_to | has_in) & ~is_create)
    ev_rows: list = ev_rows_arr.tolist()
    _cto = cust_to[ev_rows_arr]
    _cin = cust_in[ev_rows_arr]
    _hto = has_to[ev_rows_arr]
    _hin = has_in[ev_rows_arr]
    ev_vals: list = [
        (float(_cto[k]) if _hto[k] else None, float(_cin[k]) if _hin[k] else None)
        for k in range(len(ev_rows))
    ]
    n_ev = len(ev_rows)
    # constant-where-present override values per clock (the common "rule
    # always sets the same map_meta.timeout" shape): once the effective
    # clocks equal the constants, no later event can change them — the
    # event walk is skipped wholesale (same shortcut as _override_scan)
    to_vals = cust_to[has_to]
    const_to = (
        float(to_vals[0])
        if len(to_vals) and bool((to_vals == to_vals[0]).all()) else None
    )
    in_vals = cust_in[has_in]
    const_in = (
        float(in_vals[0])
        if len(in_vals) and bool((in_vals == in_vals[0]).all()) else None
    )
    no_to, no_in = not len(to_vals), not len(in_vals)

    # first-crossing rows of the row-static half of the gap condition per
    # distinct effective inactivity (memoized, as in _override_scan)
    gap_cache: dict = {}

    def _gap_rows(eff):
        hit = gap_cache.get(eff)
        if hit is None:
            r = np.flatnonzero(gap_margin > eff)
            hit = (r, r.searchsorted, ts[r].searchsorted, len(r))
            if len(gap_cache) < 8:
                gap_cache[eff] = hit
        return hit

    si = -1                                   # current session index

    def mark_span(lo: int, hi: int) -> None:
        # in-session rows between hop events: the codeblock runs for every
        # non-(duplicate-create) row
        if hi > lo:
            m = ~is_create[lo:hi]
            code_ran[lo:hi] = m
            sess_id[lo:hi][m] = si

    s = 0
    carried = init is not None
    if carried:
        creation, last_floor, _nv0, eff_to, eff_in = (
            float(init[0]), float(init[1]), int(init[2]), float(init[3]), float(init[4])
        )
        si = len(sessions)
        sessions.append(None)                 # placeholder, filled on close
        p = -1
        in_session = True
    else:
        s = next_cc(0)
        in_session = False

    while True:
        if not in_session:
            if s >= n:
                break
            # creator row: the codeblock runs (creating), its own overrides
            # apply, and an end/timeout=0 marker closes the one-row session
            si = len(sessions)
            sessions.append(None)
            creation = float(ts[s])
            last_floor = float(ts[s])
            eff_to = float(cust_to[s]) if has_to[s] else timeout
            eff_in = float(cust_in[s]) if has_in[s] else inactivity
            code_ran[s] = True
            sess_id[s] = si
            if end_flag[s] or ct0[s]:
                sessions[si] = (creation, float(ts[s]), END if end_flag[s] else CT0, s)
                s = next_cc(s + 1)
                continue
            p = s
            in_session = True

        # ---- in-session hop ----
        ei = bisect_right(ev_rows, p)
        a_raw = int(ts_ss(creation + eff_to, "right"))
        a_eff_to = eff_to
        g_rows, g_pos_ss, g_ts_ss, g_n = _gap_rows(eff_in)
        gi_dyn = int(g_ts_ss(last_floor + eff_in, "right"))
        g_eff_in = eff_in
        closed = False
        clocks_final = (no_to or eff_to == const_to) and (no_in or eff_in == const_in)
        while True:
            # next override event that would CHANGE a clock
            if clocks_final:
                o = n
                ei = n_ev
            else:
                o = n
                while ei < n_ev:
                    r = ev_rows[ei]
                    tv, iv = ev_vals[ei]
                    if (tv is not None and tv != eff_to) or (iv is not None and iv != eff_in):
                        o = r
                        break
                    ei += 1
            # next close candidate
            ci_ = cl_ss(p + 1)
            c = int(close_rows[ci_]) if ci_ < n_cl else n
            # expiry crossings
            if eff_to != a_eff_to:
                a_raw = int(ts_ss(creation + eff_to, "right"))
                a_eff_to = eff_to
            if eff_in != g_eff_in:
                g_rows, g_pos_ss, g_ts_ss, g_n = _gap_rows(eff_in)
                gi_dyn = int(g_ts_ss(last_floor + eff_in, "right"))
                g_eff_in = eff_in
            a = a_raw if a_raw > p else p + 1
            g = n
            gi = int(g_pos_ss(p + 1))
            if gi_dyn > gi:
                gi = gi_dyn
            if gi < g_n:
                g = int(g_rows[gi])
            d = a if a < g else g              # expiry row
            evt = min(d, c, o, n)
            mark_span(p + 1, evt)
            if evt >= n:
                # survives the micro-batch
                last_ts = max(last_floor, float(run[n - 1]))
                sessions[si] = (creation, last_ts, OPEN, -1)
                final = (creation, last_ts, eff_to, eff_in)
                s = n
                break
            if d <= c and d <= o:
                # expiry on row d's arrival, BEFORE d's guard/codeblock —
                # d itself may immediately create the next map
                last_ts = max(last_floor, float(run[d - 1])) if d > 0 else last_floor
                sessions[si] = (creation, last_ts, EXPIRY, d)
                s = next_cc(d)
                closed = True
                break
            if c <= o:
                # close row: codeblock runs (refreshing last), THEN the map
                # is deleted — end takes precedence over timeout=0, and the
                # row's own >0 overrides never get to matter
                code_ran[c] = True
                sess_id[c] = si
                sessions[si] = (creation, float(ts[c]), END if end_flag[c] else CT0, c)
                s = next_cc(c + 1)
                closed = True
                break
            # override event survives its own expiry check: apply
            code_ran[o] = True
            sess_id[o] = si
            tv, iv = ev_vals[ei]               # ei stopped at o's entry
            if tv is not None:
                eff_to = tv
            if iv is not None:
                eff_in = iv
            ei += 1
            p = o
            clocks_final = (no_to or eff_to == const_to) and (
                no_in or eff_in == const_in
            )
        in_session = False
        if not closed and s >= n:
            break

    # per-session code-ran counts (+ carried base on session 0)
    n_sess = len(sessions)
    if n_sess:
        counts = np.bincount(sess_id[sess_id >= 0], minlength=n_sess).astype("int64")
    else:
        counts = np.zeros(0, dtype="int64")
    if carried:
        counts[0] += int(init[2])
    if final is not None:
        final = (final[0], final[1], int(counts[n_sess - 1]), final[2], final[3])
    return WalkResult(code_ran, sess_id, sessions, counts, final)

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
    participate in correlation. Single task-partition exchange."""
    part = classified.where(
        F.col(TASK_ID_COL).isNotNull() & F.col("_rule_id").isNotNull()
    )

    close_flag = (
        (F.col("_end_flag") == 1) | (F.col("_custom_timeout") == 0.0)
    ).cast("int")
    part = part.withColumn("_close_flag", close_flag)

    w = _w()
    part = part.withColumn(ORDER_COL, F.row_number().over(w))
    # segment splits AFTER a close row: count closes strictly before me
    part = part.withColumn(
        "_end_seg",
        F.coalesce(
            F.sum("_close_flag").over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("int"),
    )

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
    same_end = F.lag("_end_seg").over(w) == F.col("_end_seg")
    gap_flag = (
        same_end & (ts_sec - F.lag(eff_last).over(w) > F.lit(inactivity))
    ).cast("int")
    # non-resetting cumulative count: ids only need to be unique within
    # (task, end_seg), which a task-wide running sum already is
    part = part.withColumn(
        "_gap_seg",
        F.coalesce(_running(F.sum(F.coalesce(gap_flag, F.lit(0)))), F.lit(0)).cast("int"),
    )

    if cfg.exact_age_cap:
        return _exact_age_seg(part, cfg)
    return _window_age_seg(part, cfg, passes=2)


def seg_start_flag() -> Column:
    """True on the first row of a (end, gap, age) segment — lag-based, so
    it stays on the single task-partition window."""
    w = _w()
    changed = F.lag("_end_seg").over(w).isNull()  # first row of the task
    for c in ("_end_seg", "_gap_seg", "_age_seg"):
        changed = changed | (F.lag(c).over(w) != F.col(c))
    return changed


def _window_age_seg(part: DataFrame, cfg: PipelineConfig, passes: int) -> DataFrame:
    """Iterated suffix split: within a segment ``ts - creation > timeout``
    is monotone in the row order, so each pass moves the crossed suffix
    into a new generation; pass *p* is exact when a segment age-splits at
    most *p* times. Strict comparison matches the reference's
    ``creation + timeout < now`` (``aggregate.rb:396``). All passes stay
    on the single task-partition window."""
    timeout = float(cfg.timeout)
    ts_sec = _ts_sec()
    part = part.withColumn("_age_seg", F.lit(0))
    for _ in range(passes):
        grp_start = seg_start_flag()
        creation = _running(
            F.max(F.when(grp_start, F.struct(F.col(ORDER_COL).alias("o"), ts_sec.alias("t"))))
        )["t"]
        crossed = ts_sec - creation > F.lit(timeout)
        part = part.withColumn(
            "_age_seg",
            (F.col("_age_seg") * 2 + F.when(crossed, 1).otherwise(0)).cast("int"),
        )
    return part


def _exact_age_seg(part: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Exact per-task scan via applyInPandas (SURVEY.md §7 hard part 1).

    Groups are single tasks — bounded by the reference's own working-set
    assumption (one in-memory map per task, warning at 5000 maps,
    ``aggregate.rb:499-516``) — so a per-group scan is small; the outer
    loop over groups is Arrow-batched. Honors per-map ``map_meta.timeout``
    / ``inactivity_timeout`` overrides (``aggregate.rb:243-246,396-397``):
    an override set by any row of the live map applies to that map's
    subsequent expiry checks.
    """
    timeout = float(cfg.timeout)
    inactivity = float(cfg.effective_inactivity_timeout)
    out_schema = part.withColumn("_age_seg", F.lit(0).cast("int")).schema

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "conv_id", "turn_idx"], kind="mergesort")
        ts = pdf["ts"].astype("int64").to_numpy() / 1e9
        end_seg = pdf["_end_seg"].to_numpy()
        cust_to = pdf["_custom_timeout"].to_numpy()
        cust_in = pdf["_custom_inactivity"].to_numpy()
        n = len(pdf)
        age = [0] * n
        cur = 0
        creation = last = 0.0
        eff_to, eff_in = timeout, inactivity
        prev_end = None
        for i in range(n):
            if end_seg[i] != prev_end:
                # hard boundary: previous map deleted by end_of_task/custom0
                cur, creation, last = 0, ts[i], ts[i]
                eff_to, eff_in = timeout, inactivity
                prev_end = end_seg[i]
            else:
                # gap + age expiry with live per-map overrides
                # (aggregate.rb:396-398,431-433)
                if (ts[i] - creation > eff_to) or (ts[i] - last > eff_in):
                    cur += 1
                    creation = ts[i]
                    eff_to, eff_in = timeout, inactivity
                last = ts[i]
            if cust_to[i] == cust_to[i] and cust_to[i] > 0:  # non-NaN, >0
                eff_to = float(cust_to[i])
            if cust_in[i] == cust_in[i] and cust_in[i] > 0:
                eff_in = float(cust_in[i])
            age[i] = cur
        pdf = pdf.copy()
        # exact mode folds gap splits into _age_seg; zero _gap_seg so the
        # aggregate stage's (end, gap, age) grouping key stays uniform
        pdf["_gap_seg"] = pd.array([0] * n, dtype="int32")
        pdf["_age_seg"] = pd.array(age, dtype="int32")
        return pdf

    return part.groupBy(TASK_ID_COL).applyInPandas(scan, schema=out_schema)

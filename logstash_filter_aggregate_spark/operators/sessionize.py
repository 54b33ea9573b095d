"""Task-instance sessionization (SURVEY.md O8/O9/O10/O12).

The reference's map lifecycle — create on first event, delete on
``end_of_task`` (``aggregate.rb:240``), expire on inactivity gap or
absolute age when the next event of the task arrives
(``aggregate.rb:420-445``) — becomes three nested window splits over the
task partition, all Catalyst built-ins:

1. ``_end_seg``  — running count of *preceding* close markers
   (``end_of_task`` rows and ``map_meta.timeout=0`` immediate evictions,
   ``aggregate.rb:259-274``): a close marker ends its own segment, the
   next row starts fresh.
2. ``_gap_seg``  — classic session-gap split: ``lag(ts)`` delta >
   ``inactivity_timeout`` (``aggregate.rb:396-398,432-433``).
3. ``_age_seg``  — absolute-age cap: split at the first row whose
   ``ts - creation_ts > timeout`` (``aggregate.rb:396,431``). Exact age
   semantics are prefix-dependent (each split resets the creation time),
   so the window form runs ``age_cap_passes`` passes, each exact for one
   more generation; ``exact_age_cap=True`` switches to a per-task
   ``applyInPandas`` scan that is exact for any depth and also honors
   per-map custom timeout overrides mid-stream.

All three are shuffle-free after the single ``_task_id`` repartition:
every window partitions by ``_task_id`` (+ finer segment columns), so
Spark reuses one exchange. This is what replaces the reference's
global mutex + ``-w 1`` worker (``docs/index.asciidoc:29-30``) — the
scalability wall SURVEY.md §3.5 flags.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.config import ORDER_COL, TASK_ID_COL, PipelineConfig

# Total order within a task partition: event time first (the reference's
# arrival order under the deterministic event-time mode, spec:374-390),
# then (conv_id, turn_idx) as the stable tiebreak (SURVEY.md §7 hard pt 4).
ORDER_BY = ["ts", "conv_id", "turn_idx"]


def sessionize(classified: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Add ``_ord``, ``_end_seg``, ``_gap_seg``, ``_age_seg`` to rows that
    participate in correlation (non-participants get NULL segments and are
    ignored by the aggregate stage)."""
    part = classified.where(
        F.col(TASK_ID_COL).isNotNull() & F.col("_rule_id").isNotNull()
    )

    close_flag = (
        (F.col("_end_flag") == 1) | (F.col("_custom_timeout") == 0.0)
    ).cast("int")
    part = part.withColumn("_close_flag", close_flag)

    w_task = W.partitionBy(TASK_ID_COL).orderBy(*ORDER_BY)
    part = part.withColumn(ORDER_COL, F.row_number().over(w_task))
    # segment splits AFTER a close row: count closes strictly before me
    part = part.withColumn(
        "_end_seg",
        F.coalesce(
            F.sum("_close_flag").over(w_task.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("int"),
    )

    inactivity = float(cfg.effective_inactivity_timeout)
    w_seg = W.partitionBy(TASK_ID_COL, "_end_seg").orderBy(*ORDER_BY)
    ts_sec = F.col("ts").cast("timestamp").cast("double")  # microsecond-precise epoch seconds
    gap_flag = (
        ts_sec - F.lag(ts_sec).over(w_seg) > F.lit(inactivity)
    ).cast("int")
    part = part.withColumn(
        "_gap_seg",
        F.coalesce(
            F.sum(F.coalesce(gap_flag, F.lit(0))).over(
                w_seg.rowsBetween(W.unboundedPreceding, 0)
            ),
            F.lit(0),
        ).cast("int"),
    )

    if cfg.exact_age_cap:
        return _exact_age_seg(part, cfg)
    return _window_age_seg(part, cfg, passes=2)


def _window_age_seg(part: DataFrame, cfg: PipelineConfig, passes: int) -> DataFrame:
    """Iterated first-crossing split: pass *p* is exact when a
    (task, end, gap) segment age-splits at most *p* times. Strict
    comparison matches the reference's ``creation + timeout < now``
    (``aggregate.rb:396``): a row at exactly ``creation + timeout`` does
    NOT expire the map."""
    timeout = float(cfg.timeout)
    ts_sec = F.col("ts").cast("timestamp").cast("double")  # microsecond-precise epoch seconds
    part = part.withColumn("_age_seg", F.lit(0))
    for _ in range(passes):
        w_full = W.partitionBy(TASK_ID_COL, "_end_seg", "_gap_seg", "_age_seg")
        creation = F.min(ts_sec).over(w_full)
        crossed = ts_sec - creation > F.lit(timeout)
        first_cross = F.min(F.when(crossed, F.col(ORDER_COL))).over(w_full)
        part = part.withColumn(
            "_age_seg",
            (
                F.col("_age_seg") * 2
                + F.when(
                    first_cross.isNotNull() & (F.col(ORDER_COL) >= first_cross), 1
                ).otherwise(0)
            ).cast("int"),
        )
    return part


def _exact_age_seg(part: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Exact per-task scan via applyInPandas (SURVEY.md §7 hard part 1).

    Groups are single tasks — bounded by the reference's own working-set
    assumption (one in-memory map per task, warning at 5000 maps,
    ``aggregate.rb:499-516``) — so a per-group numpy scan is small; the
    outer loop over groups is Arrow-batched, never per-row Python at the
    Spark level. Honors per-map ``map_meta.timeout`` /
    ``inactivity_timeout`` overrides (``aggregate.rb:243-246,396-397``):
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

"""Skew handling for hot conversations (north-star "salted-key
repartitioning and AQE skew handling").

The per-task window sort is the one stage a hot task (one conv_id with
100-1000x the median turns) can straggle: all its rows land in a single
partition's sort run. :func:`prereduce` collapses rows into per
``(task, time-bucket)`` *partial rows* BEFORE the task window — the
heavy shuffle is keyed by ``(task, bucket)`` (the salt), so a hot task
spreads across the cluster; the subsequent ordered window then sees at
most ``span/bucket`` rows per task instead of millions.

Exactness:
- inactivity-gap splits are EXACT when ``bucket_s <= inactivity_timeout``
  (two rows inside one bucket are less than a bucket apart, so a gap can
  never split mid-bucket);
- the absolute age cap may split mid-bucket; pre-reduction quantizes
  that split to a bucket boundary (error < bucket_s). Configs that need
  exact age caps should not pre-reduce (checked unless
  ``allow_age_approx=True``).

Partial rows reuse the resume-seed mechanism (``_seed_*`` columns,
plans/resume.py): the aggregate stage merges them with each fn's natural
combiner, so no second code path exists downstream.

Two eligibility tiers:

- **plain** (:func:`prereduce_eligible`): every rule ``create_or_update``
  with no ``end_of_task`` and no custom timeouts, order-insensitive aggs
  (sum/count/min/max) — the no-end-event shape (docs example #3).
- **end-marked** (handled inside :func:`prereduce`): rules may carry
  ``end_of_task`` and ``create``/``update`` guard actions. The stream is
  pre-split by the running end-marker count and guard inclusion is
  resolved in the SAME narrow pre-window (one exchange of
  engine-columns-only rows); end rows pass through un-partialed so the
  close metadata (close_kind/end_ts/end_turn_idx) stays exact. Guard
  decisions assume no mid-segment gap/age expiry — statically safe when
  both timeouts are effectively infinite (>= NO_EXPIRY_S, the batch
  example #1 shape); otherwise opt in with ``assume_no_expiry=True``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.config import (
    KIND_COL,
    TASK_ID_COL,
    ConfigurationError,
    PipelineConfig,
)
from logstash_filter_aggregate_spark.operators.correlate import SEED_RULE, _merged_agg_specs, _value_expr

_PREREDUCIBLE_FNS = {"sum", "count", "min", "max"}

# both timeouts at/above this are treated as "no expiry can occur": the
# guard precomputation in end-marked mode is then exact (a 3-year-plus
# event-time span inside one batch would violate it — pass
# assume_no_expiry explicitly in that case, or don't prereduce)
NO_EXPIRY_S = 1e8


def prereduce_eligible(cfg: PipelineConfig) -> bool:
    return (
        all(
            r.map_action == "create_or_update"
            and not r.end_of_task
            and r.custom_timeout is None
            and r.custom_inactivity_timeout is None
            for r in cfg.rules
        )
        and all(s.fn in _PREREDUCIBLE_FNS for r in cfg.rules for s in r.aggs)
    )


def prereduce(
    classified: DataFrame,
    cfg: PipelineConfig,
    bucket_s: float | None = None,
    allow_age_approx: bool = False,
) -> DataFrame:
    """Collapse classified correlation rows into per-(task, bucket)
    partial rows in seed shape. Non-participating rows are untouched by
    the caller (this operates on the correlation stream only)."""
    if not prereduce_eligible(cfg):
        raise ConfigurationError(
            "prereduce requires create_or_update-only rules without end_of_task/"
            "custom timeouts and order-insensitive aggregations (sum/count/min/max)"
        )
    inact = float(cfg.effective_inactivity_timeout)
    if bucket_s is None:
        bucket_s = inact
    if bucket_s > inact:
        raise ConfigurationError(f"bucket_s={bucket_s} must be <= inactivity_timeout={inact}")
    if cfg.timeout < float("inf") and not allow_age_approx:
        # the age cap always exists (default 1800s); quantization error is
        # < bucket_s — callers opt in explicitly
        raise ConfigurationError(
            "prereduce quantizes absolute-age splits to bucket boundaries "
            "(error < bucket_s); pass allow_age_approx=True to accept"
        )

    merged = _merged_agg_specs(cfg)
    ts_sec = F.col("ts").cast("timestamp").cast("double")
    bucket = F.floor(ts_sec / F.lit(float(bucket_s)))

    partials = []
    for name, (fn, sources) in merged.items():
        val = _value_expr(sources)
        if fn == "sum":
            partials.append(F.sum(val).alias(f"_seed_{name}"))
        elif fn == "count":
            partials.append(
                F.count(F.when(F.col(KIND_COL).isin([r for r, _ in sources]), 1)).alias(f"_seed_{name}")
            )
        elif fn == "min":
            partials.append(F.min(val).alias(f"_seed_{name}"))
        elif fn == "max":
            partials.append(F.max(val).alias(f"_seed_{name}"))

    participating = classified.where(
        F.col(TASK_ID_COL).isNotNull() & F.col(KIND_COL).isNotNull()
    )
    reduced = (
        participating.groupBy(TASK_ID_COL, F.col("conv_id"), bucket.alias("_bucket"))
        .agg(
            F.min("ts").alias("ts"),                            # arrival position of the bucket
            F.min("ts").alias("_seed_creation_ts"),
            F.max("ts").alias("_seed_lastevent_ts"),
            F.count(F.lit(1)).alias("_seed_nevents"),
            F.min("turn_idx").alias("turn_idx"),
            *partials,
        )
        .drop("_bucket")
        .withColumns(
            {
                KIND_COL: F.lit(SEED_RULE),
                "_end_flag": F.lit(0),
                "_action": F.lit("create_or_update"),
                "_cancel": F.lit(False),
                "_custom_timeout": F.lit(None).cast("double"),
                "_custom_inactivity": F.lit(None).cast("double"),
            }
        )
    )
    return reduced


def hot_task_counts(classified: DataFrame, threshold: int = 100_000) -> DataFrame:
    """Diagnostic: approximate per-task row counts above a threshold —
    the O23 map-count warning generalized to row skew
    (``aggregate.rb:499-516``)."""
    return (
        classified.groupBy(TASK_ID_COL)
        .agg(F.count(F.lit(1)).alias("rows"))
        .where(F.col("rows") >= threshold)
    )

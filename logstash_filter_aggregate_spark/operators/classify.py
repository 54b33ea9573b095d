"""Event classification + task-id extraction (SURVEY.md U2, O2).

The reference wraps each ``aggregate`` filter block in a pipeline
conditional (``if [logger] == "TASK_START"``, ``docs/index.asciidoc:55``)
and interpolates the ``task_id`` pattern per event
(``event.sprintf(@task_id)``, ``aggregate.rb:182``), skipping events
whose pattern doesn't resolve (``aggregate.rb:183``).

Here both are single-pass Catalyst expressions: a ``CASE WHEN`` chain
assigns each row the first matching rule (first-match-wins, mirroring
filter-block order), and the task-id pattern compiles to
``concat``/``cast`` — NULL when any referenced column is NULL, which
downstream treats exactly like the reference's skip.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.config import (
    KIND_COL,
    TASK_ID_COL,
    PipelineConfig,
)

_TASK_ID_SPLIT = re.compile(r"(%\{[A-Za-z_][A-Za-z0-9_]*\})")


def task_id_expr(pattern: str) -> Column:
    """Compile ``"%{a}-%{b}"`` to a concat that is NULL when any referenced
    column is NULL (so unresolved patterns drop out, ``aggregate.rb:183``).
    Numeric columns coerce to string — integer task ids behave identically
    (``spec/filters/aggregate_spec.rb:135-141``)."""
    parts: list[Column] = []
    refs: list[Column] = []
    for tok in _TASK_ID_SPLIT.split(pattern):
        if not tok:
            continue
        if tok.startswith("%{"):
            c = F.col(tok[2:-1]).cast("string")
            parts.append(c)
            refs.append(c)
        else:
            parts.append(F.lit(tok))
    expr = F.concat(*parts) if len(parts) > 1 else parts[0]
    # concat already yields NULL if any part is NULL; guard the all-literal
    # case (rejected by config validation anyway).
    for r in refs:
        expr = F.when(r.isNull(), F.lit(None)).otherwise(expr)
    return expr


def classify(parsed: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Add ``_rule_id`` (first matching rule or NULL), ``_task_id``, and
    per-rule attribute columns (``_end_flag``, ``_action``, ``_cancel``,
    ``_custom_timeout``, ``_custom_inactivity``).

    A row participates in correlation iff ``_rule_id`` and ``_task_id``
    are both non-NULL; everything else passes through untouched
    (the reference simply never routes such events into the filter).
    """
    rule_id: Column = F.lit(None).cast("string")
    end_flag: Column = F.lit(0)
    action: Column = F.lit(None).cast("string")
    cancel: Column = F.lit(False)
    custom_timeout: Column = F.lit(None).cast("double")
    custom_inactivity: Column = F.lit(None).cast("double")
    for r in reversed(cfg.rules):  # reversed so earlier rules win the CASE chain
        m = F.expr(r.match)
        rule_id = F.when(m, F.lit(r.rule_id)).otherwise(rule_id)
        end_flag = F.when(m, F.lit(1 if r.end_of_task else 0)).otherwise(end_flag)
        action = F.when(m, F.lit(r.map_action)).otherwise(action)
        cancel = F.when(m, F.lit(r.cancel)).otherwise(cancel)
        if r.custom_timeout is not None:
            custom_timeout = F.when(m, F.expr(r.custom_timeout).cast("double")).otherwise(custom_timeout)
        if r.custom_inactivity_timeout is not None:
            custom_inactivity = F.when(m, F.expr(r.custom_inactivity_timeout).cast("double")).otherwise(custom_inactivity)

    out = parsed.withColumns(
        {
            KIND_COL: rule_id,
            TASK_ID_COL: F.when(rule_id.isNotNull(), task_id_expr(cfg.task_id)),
            "_end_flag": F.when(rule_id.isNotNull(), end_flag).otherwise(F.lit(0)),
            "_action": action,
            "_cancel": F.when(rule_id.isNotNull(), cancel).otherwise(F.lit(False)),
            "_custom_timeout": custom_timeout,
            "_custom_inactivity": custom_inactivity,
        }
    )
    return out

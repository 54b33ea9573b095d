"""Distributed global ordering utilities.

``with_global_index`` assigns each row its 0-based position in the total
order WITHOUT a partition-less window (which would drag the whole
dataset through one task): classic two-pass distributed ranking —

1. range-repartition + sort within partitions on the order key (ONE
   shuffle, the same work a global sort does);
2. ``monotonically_increasing_id`` encodes (partition, local position)
   — within a sorted partition its order is the row order, so
   ``mono - min(mono)`` is the local index for free (no window);
3. a per-partition (count, min_mono) stats pass — one tiny row per
   partition collected to the driver — yields each partition's global
   offset, broadcast-joined back.

Cost at 100 TB: one range exchange + one scan for stats + the stats
broadcast; no stage ever sees more than its own partition. Used by the
exact interleaved ``push_previous`` mode (reference semantics pop the
single live map on EVERY task-id change in arrival order,
``aggregate.rb:205-208,314-320`` — a property of the global order, not
of any per-task order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_global_index(
    df: DataFrame,
    order_cols: list[str],
    col: str = "_gidx",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``col`` = the row's 0-based rank in the total order given by
    ``order_cols`` (which must be a total order — ties would make the
    index nondeterministic). Triggers one small driver action (one stats
    row per partition).

    The repartitioned subtree is pinned with an EAGER ``localCheckpoint``
    rather than ``persist``: the collected (partition → offset) stats are
    only valid for the exact materialization they were read from, and
    ``repartitionByRange`` samples its boundaries non-deterministically —
    a cache-evicted or prematurely-unpersisted subtree could silently
    recompute with a DIFFERENT row→partition assignment and corrupt every
    index. Checkpointing truncates the lineage, so recomputation is
    impossible by construction (a lost block fails the job loudly instead
    of silently mis-indexing), and the blocks are released automatically
    when the returned frame is garbage-collected — no app-lifetime cache
    accumulation across repeated pipelines and no explicit release hook
    for callers to forget."""
    spark = df.sparkSession
    k = num_partitions or spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(k, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_mono", F.monotonically_increasing_id())
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    stats = sorted(
        part.groupBy("_pid").agg(
            F.count(F.lit(1)).alias("n"), F.min("_mono").alias("m0")
        ).collect(),
        key=lambda r: r._pid,
    )
    rows, acc = [], 0
    for r in stats:
        rows.append((r._pid, acc, r.m0))
        acc += r.n
    # JVM LocalRelation via VALUES, NOT createDataFrame(list): the latter
    # parallelizes a pickled Python RDD whose execution forks one Python
    # worker PER TASK SLOT — measured as ~7s of zero-CPU blocked tasks on
    # a cold 32-core session just to materialize these few stats rows
    values = ", ".join(f"({int(p)}, {int(o)}L, {int(m)}L)" for p, o, m in rows) or "(0, 0L, 0L)"
    off = spark.sql(
        f"SELECT col1 AS _pid, col2 AS _off, col3 AS _m0 FROM VALUES {values}"
    ).select(
        F.col("_pid").cast("int"), F.col("_off").cast("long"), F.col("_m0").cast("long")
    )
    if not rows:
        off = off.where(F.lit(False))
    return (
        part.join(F.broadcast(off), "_pid")
        .withColumn(col, F.col("_off") + (F.col("_mono") - F.col("_m0")))
        .drop("_pid", "_mono", "_off", "_m0")
    )

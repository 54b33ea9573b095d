"""Deterministic synthetic transcript source (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
``conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp``.

Scenario templates (S1-S12, one per reference rspec behavior — see
FIXTURES.md §1 scenario table) are a ~60-row driver-side pandas frame;
scale-out is distributed: ``spark.range(n_convs)`` broadcast-joined to
the template on scenario id, so generating 10^9 turns never touches the
driver. S13 (hot conversation, Zipf head) is generated separately via a
range cross-join so its turn count can exceed the template size — this
is what exercises skew handling.

Everything is a pure function of (replica, t_idx): no RNG state, so any
two runs (and any partitioning) produce identical tables.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TS0 = "2026-01-01 00:00:00"

# (scenario, t_idx, role, tool, gap_s_before_this_turn, text-with-{TID}-slot)
_TEMPLATE_ROWS: list[tuple[int, int, str, str, int, str]] = [
    # S1 — example #1: start -> update(12) -> update(34) -> end; sql_duration=46
    (1, 0, "system", "none", 0, "INFO - {TID} - TASK_START - start"),
    (1, 1, "assistant", "sql", 2, "INFO - {TID} - SQL - sqlQuery1 - 12"),
    (1, 2, "assistant", "sql", 1, "INFO - {TID} - SQL - sqlQuery2 - 34"),
    (1, 3, "system", "none", 2, "INFO - {TID} - TASK_END - end"),
    # S2 — example #2: updates + end, no start (||= init path)
    (2, 0, "assistant", "sql", 0, "INFO - {TID} - SQL - sqlQuery1 - 12"),
    (2, 1, "assistant", "sql", 5, "INFO - {TID} - SQL - sqlQuery2 - 34"),
    (2, 2, "system", "none", 1, "INFO - {TID} - TASK_END - end"),
    # S3 — example #3: clicks, no end -> timeout push with clicks count
    (3, 0, "user", "none", 0, "INFO - {TID} - Clicked One"),
    (3, 1, "user", "none", 2, "INFO - {TID} - Clicked Two"),
    (3, 2, "user", "none", 1, "INFO - {TID} - Clicked Three"),
    # S4 — example #4: contiguous runs of task ids (push_previous + collect towns)
    (4, 0, "user", "search", 0, "INFO - {TID}A - Town - philadelphia"),
    (4, 1, "user", "search", 1, "INFO - {TID}A - Town - blanzy"),
    (4, 2, "user", "search", 2, "INFO - {TID}B - Town - madrid"),
    (4, 3, "user", "search", 1, "INFO - {TID}B - Town - lyon"),
    # S5 — example #5: long-running activity; small gaps but age > timeout
    (5, 0, "assistant", "python", 0, "INFO - {TID} - SQL - sqlQuery1 - 1"),
    (5, 1, "assistant", "python", 200, "INFO - {TID} - SQL - sqlQuery2 - 2"),
    (5, 2, "assistant", "python", 200, "INFO - {TID} - SQL - sqlQuery3 - 3"),
    (5, 3, "assistant", "python", 200, "INFO - {TID} - SQL - sqlQuery4 - 4"),
    (5, 4, "assistant", "python", 200, "INFO - {TID} - SQL - sqlQuery5 - 5"),
    (5, 5, "assistant", "python", 200, "INFO - {TID} - SQL - sqlQuery6 - 6"),
    # S6 — duplicate start keeps first map (spec:52-68)
    (6, 0, "system", "none", 0, "INFO - {TID} - TASK_START - start"),
    (6, 1, "system", "none", 1, "INFO - {TID} - TASK_START - start"),
    (6, 2, "assistant", "sql", 1, "INFO - {TID} - SQL - sqlQuery1 - 5"),
    (6, 3, "system", "none", 1, "INFO - {TID} - TASK_END - end"),
    # S7 — end without start: no-op under map_action=update (spec:72-84)
    (7, 0, "system", "none", 0, "INFO - {TID} - TASK_END - end"),
    # S8 — event-time expiry then restart (spec:374-390): 2 events, gap >
    # timeout, 3rd event pushes sum of first two and opens a fresh map
    (8, 0, "assistant", "sql", 0, "INFO - {TID} - SQL - sqlQuery1 - 1"),
    (8, 1, "assistant", "sql", 2, "INFO - {TID} - SQL - sqlQuery2 - 2"),
    (8, 2, "assistant", "sql", 4000, "INFO - {TID} - SQL - sqlQuery3 - 4"),
    # S9 — map_meta.timeout=0 immediate eviction (spec:392-409)
    (9, 0, "tool", "http", 0, "ERROR - {TID} - TOOL - http - E503"),
    # S10 — new_event_block inline emission (spec:423-434)
    (10, 0, "assistant", "search", 0, "INFO - {TID} - Clicked Four"),
    # S11 — code exception analog: matched update row missing duration
    (11, 0, "system", "none", 0, "INFO - {TID} - TASK_START - start"),
    (11, 1, "assistant", "sql", 1, "INFO - {TID} - SQL - sqlQueryX"),
    (11, 2, "system", "none", 1, "INFO - {TID} - TASK_END - end"),
    # S12 — integer-like task id (spec:135-141) handled by {TID} being numeric
    (12, 0, "system", "none", 0, "INFO - {TID} - TASK_START - start"),
    (12, 1, "assistant", "sql", 1, "INFO - {TID} - SQL - sqlQuery1 - 7"),
    (12, 2, "system", "none", 1, "INFO - {TID} - TASK_END - end"),
    # freeform filler (parse must pass through un-extracted)
    (1, 4, "user", "none", 1, "user says: lorem ipsum dolor sit amet"),
    (2, 3, "assistant", "none", 1, "assistant says: consectetur adipiscing"),
]

N_SCENARIOS = 12


def template_frame() -> pd.DataFrame:
    df = pd.DataFrame(
        _TEMPLATE_ROWS, columns=["scen", "t_idx", "role", "tool", "gap_s", "text"]
    )
    df = df.sort_values(["scen", "t_idx"]).reset_index(drop=True)
    df["offset_s"] = df.groupby("scen")["gap_s"].cumsum()
    return df[["scen", "t_idx", "role", "tool", "offset_s", "text"]]


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 120,
    hot_convs: int = 1,
    hot_turns: int = 600,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcripts table: ``n_convs`` scenario replicas plus
    ``hot_convs`` hot conversations of ``hot_turns`` turns each (S13).

    ``conv_id`` is ``conv-<replica:07d>`` / ``hot-<i:04d>``; the task id
    embedded in text is the digits of the replica (so S12's numeric-id
    behavior is always exercised). Timestamps: TS0 + replica-staggered
    start + per-turn offset.
    """
    tpl = spark.createDataFrame(template_frame())
    reps = spark.range(n_convs).withColumnRenamed("id", "replica")
    if partitions:
        reps = reps.repartition(partitions)
    base = reps.withColumn("scen", (F.col("replica") % N_SCENARIOS + 1).cast("int"))
    df = base.join(F.broadcast(tpl), "scen")
    df = df.select(
        F.format_string("conv-%07d", "replica").alias("conv_id"),
        F.col("t_idx").cast("int").alias("turn_idx"),
        "role",
        F.replace(
            F.col("text"), F.lit("{TID}"), F.format_string("%d", F.col("replica") + 100000)
        ).alias("text"),
        "tool",
        (
            F.to_timestamp(F.lit(TS0))
            + F.make_interval(secs=(F.col("replica") % 997) * 13 + F.col("offset_s"))
        ).alias("ts"),
    )

    if hot_convs > 0 and hot_turns > 0:
        h = (
            spark.range(hot_convs)
            .withColumnRenamed("id", "hrep")
            .join(spark.range(hot_turns).withColumnRenamed("id", "hturn"))
        )
        hot = h.select(
            F.format_string("hot-%04d", "hrep").alias("conv_id"),
            F.col("hturn").cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.format_string(
                "INFO - %d - Clicked %s",
                F.col("hrep") + 900000,
                F.element_at(
                    F.array(F.lit("One"), F.lit("Two"), F.lit("Three")),
                    (F.col("hturn") % 3 + 1).cast("int"),
                ),
            ).alias("text"),
            F.lit("none").alias("tool"),
            (
                F.to_timestamp(F.lit(TS0)) + F.make_interval(secs=F.col("hturn"))
            ).alias("ts"),
        )
        df = df.unionByName(hot)
    return df


TEMPLATE_ROWS_PER_CONV = len(_TEMPLATE_ROWS) / N_SCENARIOS


def generate_for_turns(
    spark: SparkSession, turns: int, hot_fraction: float = 0.03, partitions: int | None = None
) -> DataFrame:
    """Size-targeted generation: ~``turns`` total rows, ``hot_fraction``
    of them in one hot conversation (skew)."""
    hot = max(1, int(turns * hot_fraction))
    n_convs = max(1, int((turns - hot) / TEMPLATE_ROWS_PER_CONV))
    return generate_transcripts(spark, n_convs=n_convs, hot_convs=1, hot_turns=hot, partitions=partitions)


def role_dim(spark: SparkSession) -> DataFrame:
    """Broadcast-enrich dimension (FIXTURES.md §2; SURVEY.md U4)."""
    return spark.createDataFrame(
        [
            ("user", "human", True),
            ("assistant", "model", False),
            ("system", "infra", False),
            ("tool", "infra", False),
        ],
        ["role", "role_group", "is_human"],
    )


def tool_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [
            ("sql", "data", "high"),
            ("http", "network", "medium"),
            ("search", "network", "low"),
            ("python", "compute", "high"),
            ("none", "none", "free"),
        ],
        ["tool", "tool_family", "cost_class"],
    )


def events_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: the driver's ``events`` table reshaped to the transcript
    schema (FIXTURES.md §4) so SQL-expressible operator checks can run
    against the DuckDB oracle on identical inputs. ``user_id`` plays
    conv_id, ``event_type`` is embedded in a grok-able text line.
    """
    # NOT spread_input-widened: measured at sf0.1/local[32], widening this
    # one-row-group scan costs more in exchange + extra AQE stage than the
    # ~0.4s single-core parse it parallelizes (events_gap 2.4-2.7s ->
    # 3.0-3.5s with widening; o16 a wash) — unlike the dedup/textstats
    # operators, whose per-row compute dominates by orders of magnitude
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # turn_idx only serves as the stable tiebreak inside the engine's
    # (ts, conv_id, turn_idx) total order — event_id induces the SAME
    # order as a per-user row_number over (ts, event_id) would, without
    # paying a window shuffle in every query that uses this adapter.
    # Kept LONG: event_id is int64, and narrowing it to int would
    # overflow past 2^31 events (ANSI runtime failure, or silent
    # negative wrap corrupting the total-order tiebreak with ANSI off).
    return ev.select(
        F.format_string("conv-%d", "user_id").alias("conv_id"),
        F.col("event_id").cast("long").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.format_string(
            "INFO - %d - EVENT - %s - %d", "user_id", "event_type",
            F.floor("value").cast("long"),  # floor: identical in Spark and DuckDB (round ties differ)
        ).alias("text"),
        F.lit("none").alias("tool"),
        "ts",
    )


def write_bucketed_table(
    df,
    table: str,
    bucket_col: str = "conv_id",
    buckets: int = 32,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a transcript table bucketed (and sorted) by its task-id
    column. When the correlation config's ``task_id`` is that single
    column (e.g. ``"%{conv_id}"``), the scan's bucket HashPartitioning
    propagates through the narrowed stream into every correlation window
    and the session groupBy — the event-stream exchange is elided
    entirely. At 100 TB this turns the pipeline's one wide shuffle into
    zero: re-runs, resumes and multi-config sweeps over the same corpus
    pay the shuffle once at ingest instead of per job.
    """
    w = (
        df.write.bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .mode(mode)
        .format("parquet")
    )
    if path is not None:  # external table at an explicit location
        w = w.option("path", path)
    w.saveAsTable(table)

"""Routed sinks + run metrics + lineage manifest (SURVEY.md U5, O21, O22).

Each pipeline output bucket (completed / timeout / inline / open /
passthrough) writes to its own directory under a run-scoped path; row
counts per sink are captured with ``Observation`` (no extra counting
jobs — the metric rides the write action), and a JSON lineage manifest
records the input files, config fingerprint, per-sink counts, and
completion marker. Re-running the same (input, config) run_id skips
completed sinks — idempotent, resumable writes (the batch analog of the
reference's ``aggregate_maps_path`` persistence, ``aggregate.rb:125-140``).

Iceberg note: writers take ``fmt`` — ``"iceberg"`` works unchanged when
a catalog is configured (``spark.sql.catalog...``); this container has no
Iceberg jars, so parquet is the default and tests run on parquet.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.config import PipelineConfig

SINKS = ("completed", "timeout", "inline", "open", "passthrough")


def config_fingerprint(cfg: PipelineConfig) -> str:
    return hashlib.md5(repr(cfg).encode()).hexdigest()[:16]


def run_id_for(input_desc: str, cfg: PipelineConfig) -> str:
    return hashlib.md5(f"{input_desc}|{config_fingerprint(cfg)}".encode()).hexdigest()[:16]


@dataclass
class RunManifest:
    run_id: str
    input_desc: str
    input_files: list[str]
    config_fingerprint: str
    sinks: dict[str, dict] = field(default_factory=dict)  # sink -> {rows, path, wall_s, done}
    started_at: float = 0.0
    finished_at: float | None = None

    def path(self, base: str) -> str:
        return f"{base}/_lineage/{self.run_id}.json"

    def save(self, base: str) -> None:
        p = self.path(base)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=2, default=str)
        os.replace(tmp, p)  # atomic manifest update

    @classmethod
    def load(cls, base: str, run_id: str) -> "RunManifest | None":
        p = f"{base}/_lineage/{run_id}.json"
        if not os.path.exists(p):
            return None
        with open(p) as f:
            d = json.load(f)
        return cls(**d)


def input_files_of(df: DataFrame) -> list[str]:
    try:
        return sorted(df.inputFiles())
    except Exception:
        return []


def write_routed(
    outputs: dict[str, DataFrame],
    base_path: str,
    cfg: PipelineConfig,
    input_desc: str,
    fmt: str = "parquet",
    partition_by: dict[str, list[str]] | None = None,
    input_df: DataFrame | None = None,
) -> RunManifest:
    """Write every bucket, resumably.

    - sink path: ``{base_path}/{sink}/run_id={run_id}`` — reruns overwrite
      their own run scope only (idempotent).
    - already-done sinks (per the manifest) are skipped.
    - per-sink row counts via ``Observation`` — no separate count() jobs.
    """
    run_id = run_id_for(input_desc, cfg)
    manifest = RunManifest.load(base_path, run_id)
    if manifest is None:
        files_src = input_df if input_df is not None else next(iter(outputs.values()))
        manifest = RunManifest(
            run_id=run_id,
            input_desc=input_desc,
            input_files=input_files_of(files_src),
            config_fingerprint=config_fingerprint(cfg),
            started_at=time.time(),
        )
    for sink, df in outputs.items():
        if sink == "sessions":
            continue
        if manifest.sinks.get(sink, {}).get("done"):
            continue  # resumable: this sink already landed for this run_id
        path = f"{base_path}/{sink}/run_id={run_id}"
        obs = Observation(f"rows_{sink}")
        t0 = time.time()
        observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        writer = observed.write.mode("overwrite").format(fmt)
        for col in (partition_by or {}).get(sink, []):
            writer = writer.partitionBy(col)
        writer.save(path)
        manifest.sinks[sink] = {
            "rows": obs.get["rows"],
            "path": path,
            "wall_s": round(time.time() - t0, 3),
            "done": True,
        }
        manifest.save(base_path)  # checkpoint after every sink
    manifest.finished_at = time.time()
    manifest.save(base_path)
    return manifest


def partition_metrics(df: DataFrame) -> DataFrame:
    """Per-input-partition lineage + metrics rows (SURVEY.md O22 /
    north-star "per-partition lineage + metrics"): one row per input
    file-split with its row count — written alongside the manifest so a
    resumed run can account for exactly which splits fed which outputs."""
    return (
        df.groupBy(F.input_file_name().alias("input_file"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
    )


def write_run(
    spark: SparkSession,
    outputs,
    transcripts: DataFrame,
    base_path: str,
    cfg: PipelineConfig,
    input_desc: str,
    fmt: str = "parquet",
) -> RunManifest:
    """Full run: routed sinks + per-partition lineage table."""
    manifest = write_routed(
        outputs.as_dict(), base_path, cfg, input_desc, fmt=fmt, input_df=transcripts
    )
    if not manifest.sinks.get("_partitions", {}).get("done"):
        pm_path = f"{base_path}/_lineage/partitions/run_id={manifest.run_id}"
        partition_metrics(transcripts).write.mode("overwrite").format(fmt).save(pm_path)
        manifest.sinks["_partitions"] = {"path": pm_path, "done": True}
        manifest.save(base_path)
    return manifest

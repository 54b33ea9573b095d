"""Streaming ingestion → incremental dedup store (streaming/ingest.py)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from logstash_filter_aggregate_spark.operators import dedup
from logstash_filter_aggregate_spark.streaming.ingest import stream_dedup_to_store
from tests.test_incremental import _corpus


def _stage_files(spark, df, splits, src_dir):
    """Write one single-file parquet per id-range split, named and
    mtime-ordered so the file source replays them as ordered batches."""
    os.makedirs(src_dir, exist_ok=True)
    for k, (lo, hi) in enumerate(splits):
        tmp = f"{src_dir}__tmp"
        (df.where(f"doc_id >= {lo} and doc_id < {hi}")
           .coalesce(1).write.mode("overwrite").parquet(tmp))
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), os.path.join(src_dir, f"{k:03d}.parquet"))
        shutil.rmtree(tmp)
    return src_dir


def test_stream_ingest_exact_equals_full_corpus(spark, tmp_path):
    # three arrival batches through the real streaming seam: the union
    # of per-batch survivors == the one-shot full-corpus dedup relation
    df = _corpus(spark)
    src = _stage_files(spark, df, [(0, 20), (20, 40), (40, 60)],
                       str(tmp_path / "src"))
    store, out, cp = (str(tmp_path / d) for d in ("store", "out", "cp"))
    q = stream_dedup_to_store(
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
        store, out, cp,
    )
    q.awaitTermination(180)
    got = spark.read.option("basePath", out).parquet(out)
    assert got.select("batch_id").distinct().count() == 3
    full = sorted(
        r.canonical_id for r in dedup.exact_dedup(df).collect()
    )
    assert sorted(r.doc_id for r in got.select("doc_id").collect()) == full
    # the store holds exactly one hash per distinct content
    n_store = spark.read.option("basePath", store).parquet(store).count()
    assert n_store == len(full)


def test_stream_ingest_minhash_planted_cross_batch_pair(spark, tmp_path):
    # a copy arriving in a LATER micro-batch surfaces as a batch-vs-store
    # candidate at est_jaccard 1.0
    df = _corpus(spark, n=30)
    planted = df.where("doc_id = 2").select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    src = _stage_files(
        spark, df.unionByName(planted), [(0, 15), (15, 2000)],
        str(tmp_path / "src"),
    )
    store, out, cp = (str(tmp_path / d) for d in ("store", "out", "cp"))
    q = stream_dedup_to_store(
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
        store, out, cp,
        mode="minhash", k=3, num_hashes=16, bands=16,
    )
    q.awaitTermination(180)
    got = spark.read.option("basePath", out).parquet(out)
    pairs = {
        (r.new_id, r.peer_id)
        for r in got.where("source = 'store' and est_jaccard = 1.0").collect()
    }
    assert (1002, 2) in pairs, sorted(pairs)


def test_stream_ingest_mode_validation(spark, tmp_path):
    df = _corpus(spark, n=4)
    with pytest.raises(ValueError, match="mode"):
        stream_dedup_to_store(
            spark.readStream.schema(df.schema).parquet(str(tmp_path)),
            str(tmp_path / "s"), str(tmp_path / "o"), str(tmp_path / "c"),
            mode="fuzzy",
        )


def test_stream_ingest_with_inline_compaction(spark, tmp_path):
    # compact_every folds store maintenance into the stream: semantics
    # identical, batch dirs consolidated as the run proceeds
    import os

    df = _corpus(spark)
    src = _stage_files(
        spark, df, [(0, 12), (12, 24), (24, 36), (36, 48), (48, 60)],
        str(tmp_path / "src"),
    )
    store, out, cp = (str(tmp_path / d) for d in ("store", "out", "cp"))
    q = stream_dedup_to_store(
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1).parquet(src),
        store, out, cp, compact_every=2,
    )
    q.awaitTermination(180)
    full = sorted(r.canonical_id for r in dedup.exact_dedup(df).collect())
    got = spark.read.option("basePath", out).parquet(out)
    assert sorted(r.doc_id for r in got.select("doc_id").collect()) == full
    dirs = sorted(d for d in os.listdir(store) if d.startswith("batch_id="))
    # 5 batches with compactions at 2 and 4 leave fewer dirs than batches
    assert len(dirs) < 5 and any(d.startswith("batch_id=-") for d in dirs)

"""Streaming ingestion with incremental dedup against a persisted store.

The end-to-end form a 100 TB training-data ingestion pipeline actually
runs: documents ARRIVE as a stream, each micro-batch is deduped against
everything already accepted (:mod:`operators.incremental` — exact
hashes, MinHash signatures, or embedding signatures), survivors land in
per-batch output directories, and the store grows by exactly the
accepted rows.

Why foreachBatch is the right seam (and not a stateful operator): the
dedup store must outlive any one query (multiple pipelines, offline
backfills, and compaction jobs all read it), so it lives on shared
storage with partition-pruned reads rather than inside Spark's
per-query state store. foreachBatch gives the micro-batch id used for
BOTH idempotency layers:

- the store append rides ``batch_id=N`` overwrite-replay semantics
  (``incremental.py``): a crashed-and-replayed batch overwrites its own
  store contribution;
- the survivor output writes to ``out_dir/batch_id=N`` with overwrite —
  the standard idempotent-foreachBatch pattern (same as
  :func:`stream.stream_to_routed_sinks`).

Single-writer contract: micro-batches of ONE query run sequentially, so
the store's writer lease is naturally uncontended; a second pipeline
ingesting into the same store fails fast with
:class:`~logstash_filter_aggregate_spark.operators.incremental.ConcurrentWriterError`
instead of silently racing (see the incremental module doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from logstash_filter_aggregate_spark.operators.incremental import (
    compact_store,
    incremental_embedding_candidates,
    incremental_exact_dedup,
    incremental_minhash_candidates,
)

_MODES = {
    "exact": incremental_exact_dedup,
    "minhash": incremental_minhash_candidates,
    "embedding": incremental_embedding_candidates,
}


def stream_dedup_to_store(
    stream_df: DataFrame,
    store_dir: str,
    out_dir: str,
    checkpoint: str,
    mode: str = "exact",
    available_now: bool = True,
    compact_every: int | None = None,
    **op_kwargs,
):
    """Start the ingestion query: each micro-batch runs the ``mode``
    incremental operator against ``store_dir`` and writes its result
    (exact: surviving rows; minhash/embedding: candidate pairs) to
    ``out_dir/batch_id=N``. Returns the started StreamingQuery.

    ``compact_every=N`` folds store maintenance into the pipeline:
    after every Nth micro-batch, :func:`~...incremental.compact_store`
    merges the accumulated batch dirs (keeping the newest, which a
    replay can still overwrite) so pruned-read listing cost stays flat
    on long runs. It runs between batches, where the writer lease is
    free by construction.

    ``op_kwargs`` pass through to the operator (``id_col``,
    ``text_col``/``vec_col``, banding/plane parameters, ``max_bucket``,
    ``lease_ttl_s``). Read results with
    ``spark.read.option("basePath", out_dir).parquet(out_dir)``.
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}, got {mode!r}")
    if compact_every is not None and compact_every < 2:
        raise ValueError("compact_every must be >= 2 (or None)")
    op = _MODES[mode]

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        result = op(batch_df, store_dir, batch_id=batch_id, **op_kwargs)
        result.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_store(batch_df.sparkSession, store_dir, keep_last=1)

    writer = (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

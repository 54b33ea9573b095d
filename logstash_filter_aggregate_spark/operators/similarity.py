"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline (single pass,
JVM-side ``zip_with``/``aggregate`` dot products — no UDF, no collect);
the LSH-bucketed variant is the 100 TB path: random-hyperplane
signatures prune candidates so the expensive dot product runs on a
small fraction of rows. Hyperplanes are derived deterministically from
``xxhash64`` so any two runs (and the DuckDB oracle, where applicable)
agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Single-pass cosine: one aggregate with a (dot, |a|², |b|²) struct
    accumulator — both faster than three passes and immune to the PySpark
    multi-HOF lambda-binding quirk (see hyperplane_signature)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))),
        F.struct(F.lit(0.0).alias("d"), F.lit(0.0).alias("na"), F.lit(0.0).alias("nb")),
        lambda acc, p: F.struct(
            (acc["d"] + p["x"] * p["y"]).alias("d"),
            (acc["na"] + p["x"] * p["x"]).alias("na"),
            (acc["nb"] + p["y"] * p["y"]).alias("nb"),
        ),
        lambda acc: acc["d"] / (F.sqrt(acc["na"]) * F.sqrt(acc["nb"])),
    )


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a constant query vector. The scan is
    embarrassingly parallel; the only cross-partition step is the global
    top-k, which Spark's TakeOrdered runs as per-partition top-k + merge
    (no full sort, no shuffle of the data)."""
    # NOT spread_input-widened: the per-row dot product is light enough
    # that the widening exchange costs more than it saves (bench runs
    # 0.52-0.55s unwidened vs 0.74-0.78s widened, 3 cold samples each)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col), q).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def hyperplane_signature(vec_col: Column, num_planes: int = 16, dim: int = 64) -> Column:
    """Random-hyperplane LSH signature: plane p, component d has weight
    ±1 by parity of xxhash64("p:d") — data-independent and deterministic.
    Returns an int bit-signature column.

    Built as ONE nested higher-order expression (every lambda occurs
    exactly once): PySpark mis-binds lambda variables when several
    independently-built HOF trees are merged into a single expression
    (verified in tests/test_dedup_similarity.py::test_hof_lambda_quirk_workaround),
    so the per-plane loop lives inside a Catalyst ``transform``, not in Python.
    """
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda d: (
                            F.xxhash64(F.concat(p.cast("string"), F.lit(":"), d.cast("string")))
                            .bitwiseAND(F.lit(1)) * 2 - 1
                        ).cast("double"),
                    ),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ) > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.lit(num_planes - 1)),
            # b * 2^i via exact double pow (num_planes <= 32 << 53 bits)
            lambda b, i: b * F.pow(F.lit(2.0), i.cast("double")).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    max_hamming: int = 4,
) -> DataFrame:
    """Approximate top-k: score only rows whose hyperplane signature is
    within ``max_hamming`` bits of the query's. At scale, persist the
    signature column (or bucket the table by it) so the probe is a
    partition-pruned scan instead of a full pass."""
    dim = len(query_vec)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sigged = df.withColumn("_sig", hyperplane_signature(F.col(vec_col), num_planes, dim))
    qsig_row = (
        df.sparkSession.range(1)
        .select(hyperplane_signature(q, num_planes, dim).alias("qsig"))
    )
    cand = sigged.crossJoin(F.broadcast(qsig_row)).where(
        F.bit_count(F.col("_sig").bitwiseXOR(F.col("qsig"))) <= max_hamming
    )
    return (
        cand.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    dim: int = 64,
    min_cosine: float = 0.9,
    max_bucket: int = 256,
) -> DataFrame:
    """Embedding-cosine near-dup detection: bucket by full LSH signature
    (high precision), verify candidates with the exact cosine.

    Clustered embeddings (common in real corpora) make signature buckets
    hot, so the bucket join is capped at ``max_bucket`` members with a
    ``truncated`` disclosure column — the same safety valve as
    ``dedup.minhash_lsh_candidates`` — instead of an uncapped self-join."""
    sigged = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        hyperplane_signature(F.col(vec_col), num_planes, dim).alias("sig"),
    )
    buckets = (
        sigged.groupBy("sig")
        .agg(F.sort_array(F.collect_list(F.struct("id", "v"))).alias("members"))
        .where(F.size("members") >= 2)
    )
    bucket_truncated = (F.size("members") > max_bucket).alias("truncated")
    members = F.slice("members", 1, max_bucket)
    pairs = F.explode(
        F.flatten(
            F.transform(
                members,
                lambda x, i: F.transform(
                    F.slice(members, i + 2, max_bucket),
                    lambda y: F.struct(
                        x["id"].alias("id_a"),
                        y["id"].alias("id_b"),
                        cosine(x["v"], y["v"]).alias("cos_sim"),
                    ),
                ),
            )
        )
    )
    return (
        buckets.select(pairs.alias("p"), bucket_truncated)
        .select("p.id_a", "p.id_b", "p.cos_sim", "truncated")
        .where(F.col("cos_sim") >= min_cosine)
    )


def _normalized_rows(mat):
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _cell_assigner(centroids: list[list[float]], vec_col: str):
    """Arrow-vectorized cell assignment: one numpy matmul per batch
    against the (small, broadcast-in-closure) normalized centroid matrix
    — dense linear algebra is the one place a pandas UDF beats Catalyst
    HOFs. Ties break to the lowest cell id (np.argmax takes the first
    maximum), so assignment is deterministic."""
    from pyspark.sql.functions import pandas_udf

    cn = _normalized_rows(np.array(centroids, dtype=np.float64))

    @pandas_udf("int")
    def cell_of(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        scores = _normalized_rows(mat) @ cn.T
        return pd.Series(np.argmax(np.nan_to_num(scores), axis=1).astype("int32"))

    return cell_of(F.col(vec_col))


def kmeans_centroids(
    df: DataFrame,
    k: int = 16,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over the embedding column, Spark-native:

    - init: k rows picked by xxhash64 rank of the id (pseudo-random
      spread, fully deterministic — no RNG state);
    - assign: Arrow-batched matmul against the broadcast centroid matrix;
    - update: per-(cell, dimension) mean via ``posexplode`` + groupBy —
      partial aggregation map-side, so each iteration is one shuffle of
      (cell, pos, partial-sum) rows, never the vectors themselves.

    Each iteration collects only the k×dim centroid matrix to the driver
    (model state, not data). Empty cells keep their previous centroid."""
    seeds = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), "id")
        .limit(k)
        .collect()
    )
    cents = [[float(x) for x in r.v] for r in seeds]
    for _ in range(iters):
        assigned = df.select(
            _cell_assigner(cents, vec_col).alias("cell"),
            F.col(vec_col).alias("v"),
        )
        new = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("c")
            )
            .collect()
        )
        by_cell = {r.cell: [float(x) for x in r.c] for r in new}
        cents = [by_cell.get(i, cents[i]) for i in range(len(cents))]
    return cents


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    centroids: list[list[float]] | None = None,
    train_iters: int = 3,
) -> DataFrame:
    """IVF-flat over real k-means centroids (:func:`kmeans_centroids`):
    assign every vector to its max-cosine centroid, probe the ``n_probe``
    cells whose centroids are nearest the query, exact-rank only the
    probed candidates. At 100 TB, train the centroids once and persist
    the assigned table bucketed/partitioned by ``_cell`` so a probe is a
    partition-pruned scan; pass the trained ``centroids`` in."""
    cents = centroids if centroids is not None else kmeans_centroids(
        df, k=n_cells, iters=train_iters, id_col=id_col, vec_col=vec_col
    )
    qn = _normalized_rows(np.array([query_vec], dtype=np.float64))[0]
    cn = _normalized_rows(np.array(cents, dtype=np.float64))
    order = np.argsort(-(cn @ qn), kind="stable")
    probe = [int(c) for c in order[: max(1, min(n_probe, len(cents)))]]

    q = F.array(*[F.lit(float(v)) for v in query_vec])
    celled = df.withColumn("_cell", _cell_assigner(cents, vec_col))
    cand = celled.where(F.col("_cell").isin(probe))
    return (
        cand.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )

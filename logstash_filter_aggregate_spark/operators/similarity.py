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

import math

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


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-flat with deterministic hash-grid centroids: assign each vector
    to its nearest pseudo-centroid (hyperplane-signature prefix acts as the
    cell id), probe the ``n_probe`` cells nearest the query. A real system
    would k-means the centroids; the cell/probe plumbing — the part that
    matters for the Spark plan — is identical."""
    bits = max(1, int(math.log2(n_cells)))
    dim = len(query_vec)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cell = lambda v: hyperplane_signature(v, bits, dim)  # noqa: E731
    celled = df.withColumn("_cell", cell(F.col(vec_col)))
    qcells = (
        df.sparkSession.range(1)
        .select(F.explode(F.sequence(F.lit(0), F.lit(n_probe - 1))).alias("flip"))
        .select((cell(q).bitwiseXOR(F.col("flip"))).alias("_cell"))
    )
    cand = celled.join(F.broadcast(qcells), "_cell")
    return (
        cand.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.col(id_col))
        .limit(k)
    )

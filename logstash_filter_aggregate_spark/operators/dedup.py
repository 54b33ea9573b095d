"""Deduplication operators for large-scale training-data pipelines.

All JVM-side Catalyst expressions (xxhash64 / md5 / higher-order array
functions) — no Python in the hot path. Scale notes per operator:

- exact:   one shuffle on the content hash; at 100 TB use the hash as the
           shuffle key directly (never the raw text).
- minhash: shingle → K minhashes → B bands; candidate generation is a
           self-join on (band_idx, band_hash) — the classic LSH bucket
           join, linear in candidates rather than quadratic in docs.
- simhash: 64-bit signature via bitwise majority of token hashes; near
           dups share all but a few bits; bucket on bit-blocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_text(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def content_hash(col: str | Column = "text") -> Column:
    return F.md5(normalized_text(col))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized content,
    keeping the smallest id as canonical + the duplicate count."""
    return (
        df.select(F.col(id_col), content_hash(text_col).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def tokens(col: str | Column = "text") -> Column:
    return F.split(normalized_text(col), r"\s+")


def shingles(col: str | Column = "text", k: int = 5) -> Column:
    """Word k-shingles as an array column (higher-order functions only)."""
    t = tokens(col)
    n = F.size(t)
    return F.when(n >= k, F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)),
    )).otherwise(F.array(F.concat_ws(" ", t)))


def minhash_signature(shingle_col: Column, num_hashes: int = 16) -> Column:
    """K independent minhashes: h_i(s) = xxhash64(i || s); min over shingles.
    Deterministic, JVM-side, no UDF. One nested HOF tree (transform over
    seeds) rather than K python-assembled trees — see
    similarity.hyperplane_signature for the lambda-binding quirk."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingle_col, lambda s: F.xxhash64(F.concat(i.cast("string"), F.lit("|"), s)))
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash + LSH banding: docs sharing any band bucket become candidate
    pairs (id_a < id_b), annotated with their estimated jaccard (fraction
    of agreeing minhashes). The band self-join is the only shuffle that
    grows with corpus size; band width num_hashes//bands controls the
    candidate false-positive rate."""
    rows_per_band = num_hashes // bands
    sig = (
        df.select(F.col(id_col).alias("id"), shingles(text_col, k).alias("sh"))
        .withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
        .drop("sh")
    )
    banded = sig.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.xxhash64(
                        F.concat_ws(",", F.transform(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ))
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("id", "sig", "band.band_idx", "band.band_hash")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (
                F.size(F.filter(F.zip_with("a.sig", "b.sig", lambda x, y: x == y), lambda eq: eq))
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_jaccard: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs found via shared shingles
    (explode + self-join on the shingle hash, then |A∩B| / |A∪B|).
    Suitable as the verify stage after :func:`minhash_lsh_candidates`."""
    sh = (
        df.select(F.col(id_col).alias("id"), F.array_distinct(shingles(text_col, k)).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
    )
    exploded = sh.select("id", "n_sh", F.explode("sh").alias("s")).withColumn(
        "s_hash", F.xxhash64("s")
    ).drop("s")
    a, b = exploded.alias("a"), exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.s_hash") == F.col("b.s_hash")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return inter.select(
        "id_a",
        "id_b",
        (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
    ).where(F.col("jaccard") >= min_jaccard)


def simhash64(col: str | Column = "text") -> Column:
    """64-bit SimHash: per-bit majority vote over token xxhash64 values,
    expressed entirely with higher-order functions (one aggregate over the
    token array building a 64-wide counter vector)."""
    t = tokens(col)
    bit_votes = F.aggregate(
        t,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, tok: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda b: (F.getbit(F.xxhash64(tok), b) * 2 - 1).cast("long"),
            ),
            lambda a_, v: a_ + v,
        ),
    )
    # Fold votes -> signed 64-bit in ONE nested HOF expression: PySpark
    # mis-binds lambda variables when independently-built HOF trees merge
    # into a single expression (see similarity.hyperplane_signature), so
    # no Python-side loop over bits. 2^b is exact as a double for any b;
    # bit 63 is the sign bit, added as Long.MIN_VALUE.
    return F.aggregate(
        F.zip_with(
            bit_votes,
            F.sequence(F.lit(0), F.lit(63)),
            lambda v, b: F.when(
                v <= 0, F.lit(0).cast("long")
            ).when(
                b == 63, F.lit(-9223372036854775808)
            ).otherwise(F.pow(F.lit(2.0), b.cast("double")).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_near_dups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on 4 16-bit blocks (pigeonhole —
    any pair within hamming distance 3 shares at least one exact block),
    then verify the full hamming distance with bit_count."""
    sig = df.select(F.col(id_col).alias("id"), simhash64(text_col).alias("sim"))
    blocks = sig.select(
        "id",
        "sim",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(blk).alias("blk"),
                    F.shiftrightunsigned(F.col("sim"), blk * 16)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("blk_val"),
                )
                for blk in range(4)
            ])
        ).alias("b"),
    ).select("id", "sim", "b.blk", "b.blk_val")
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.blk_val") == F.col("b.blk_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )

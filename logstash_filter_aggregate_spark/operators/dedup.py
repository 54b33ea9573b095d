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

from logstash_filter_aggregate_spark.operators.spread import spread_input


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


def shingle_hashes(col: str | Column = "text", k: int = 3) -> Column:
    """Hashes of word k-shingles WITHOUT materializing shingle strings:
    hash each token once, then combine k consecutive token hashes with
    multi-argument ``xxhash64`` over shifted arrays. Higher-order
    functions are interpreted (not codegen'd), so avoiding per-position
    ``slice`` + ``concat_ws`` string building is a ~5x win."""
    t = tokens(col)
    th = F.transform(t, lambda tok: F.xxhash64(tok))
    n = F.size(th)
    combined = th
    for j in range(1, k):
        shifted = F.slice(th, j + 1, F.greatest(n - j, F.lit(0)))
        combined = F.zip_with(combined, shifted, lambda a, b: F.xxhash64(a, b))
    # zip_with pads the shorter side with NULL, and xxhash64 *ignores*
    # NULL inputs (it does not propagate), so the k-1 tail slots hold
    # short-shingle hashes — slice to the exact n-k+1 count instead.
    # Docs with fewer than k tokens produce no shingles.
    return F.slice(combined, 1, F.greatest(n - (k - 1), F.lit(0)))


def minhash_signature(shingle_hash_col: Column, num_hashes: int = 16) -> Column:
    """K independent minhashes: h_i(s) = xxhash64(i, s) over shingle
    hashes; min over shingles. Deterministic, JVM-side, no UDF, and no
    string building. One nested HOF tree (transform over seeds) rather
    than K python-assembled trees — see similarity.hyperplane_signature
    for the PySpark lambda-binding quirk."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingle_hash_col, lambda s: F.xxhash64(i, s))
        ),
    )


def banded_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """``(id, sig, band_idx, band_hash)`` rows — the MinHash signature
    plus one row per LSH band. The signature is built via explode +
    groupBy rather than the array-HOF form: higher-order lambdas are
    interpreted row-at-a-time, while the exploded per-shingle seed
    hashes are plain projected expressions inside whole-stage codegen
    (~10x). Partial aggregation combines the mins map-side, so the
    shuffle carries one row per doc. Shared by
    :func:`minhash_lsh_candidates` (full-corpus pairs) and
    :func:`incremental.incremental_minhash_candidates` (the persisted
    signature store)."""
    rows_per_band = num_hashes // bands
    # shingling + K seed hashes is ~ms/row CPU: widen a one-row-group
    # input so the signature stage uses every core (identity at scale)
    df = spread_input(df)
    exploded = df.select(
        F.col(id_col).alias("id"), F.explode(shingle_hashes(text_col, k)).alias("s")
    )
    sig = (
        exploded.groupBy("id")
        .agg(*[F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"_h{i}") for i in range(num_hashes)])
        .select("id", F.array(*[f"_h{i}" for i in range(num_hashes)]).alias("sig"))
    )
    return sig.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band_idx"),
                    F.aggregate(
                        F.slice("sig", b * rows_per_band + 1, rows_per_band),
                        F.lit(0).cast("long"),
                        lambda acc, x: F.xxhash64(acc, x),
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("id", "sig", F.col("band.band_idx").alias("band_idx"), F.col("band.band_hash").alias("band_hash"))


def est_jaccard(sig_a, sig_b, num_hashes: int) -> Column:
    """Fraction of agreeing minhashes — the LSH jaccard estimate."""
    return (
        F.size(F.filter(F.zip_with(sig_a, sig_b, lambda p, q: p == q), lambda eq: eq))
        / F.lit(float(num_hashes))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 64,
) -> DataFrame:
    """MinHash + LSH banding: docs sharing any band bucket become candidate
    pairs (id_a < id_b), annotated with their estimated jaccard (fraction
    of agreeing minhashes).

    Candidate generation is ONE shuffle: explode (band_idx, band_hash),
    groupBy the bucket, emit in-bucket pairs with a nested transform —
    the input (and its signature computation) is scanned once, unlike a
    self-join, whose two sides each recompute the signatures. Buckets are
    capped at ``max_bucket`` members (degenerate buckets — e.g. the
    all-empty-text bucket — would otherwise go quadratic); at 100 TB the
    cap is the safety valve that keeps the worst key from dominating a
    partition, and dropped buckets are reported via the `truncated` flag
    so the caller can see coverage loss instead of silently missing it."""
    banded = banded_signatures(df, id_col, text_col, k, num_hashes, bands)
    buckets = banded.groupBy("band_idx", "band_hash").agg(
        F.sort_array(F.collect_list(F.struct("id", "sig"))).alias("members")
    ).where(F.size("members") >= 2)
    # no-silent-caps contract: pairs that came out of an over-capacity
    # bucket carry truncated=true — coverage past max_bucket was dropped
    # there, and the caller can see it instead of silently missing it
    bucket_truncated = (F.size("members") > max_bucket).alias("bucket_truncated")
    members = F.slice("members", 1, max_bucket)
    pair_struct = F.explode(
        F.flatten(
            F.transform(
                members,
                lambda x, i: F.transform(
                    F.slice(members, i + 2, max_bucket),
                    lambda y: F.struct(
                        x["id"].alias("id_a"),
                        y["id"].alias("id_b"),
                        est_jaccard(x["sig"], y["sig"], num_hashes).alias("est_jaccard"),
                    ),
                ),
            )
        )
    )
    return (
        buckets.select(pair_struct.alias("p"), bucket_truncated)
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(
            # est_jaccard is a pure function of the two signatures —
            # identical in every bucket that emitted the pair
            F.first(F.col("p.est_jaccard")).alias("est_jaccard"),
            F.max("bucket_truncated").alias("truncated"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_jaccard: float = 0.0,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs found via shared shingles
    (explode + self-join on the shingle hash, then |A∩B| / |A∪B|).
    Suitable as the verify stage after :func:`minhash_lsh_candidates`.
    Shingles are compared by hash (collision odds ~n²/2⁶⁴ — negligible),
    so no shingle strings are ever built.

    ``max_df`` caps the **document frequency** of join-key shingles: a
    shingle present in f docs contributes f² join rows, so one ubiquitous
    shingle (boilerplate, empty-doc token) makes the self-join quadratic
    at scale. Shingles with df > max_df are excluded from the
    intersection count (the standard df-cut for Jaccard verification) —
    union sizes stay exact, so the reported jaccard is a lower bound for
    pairs that shared only ultra-common shingles. ``None`` (the default)
    keeps results exact — the cap is OPT-IN because it changes reported
    values; at corpus scale pass e.g. ``max_df=1000`` (and expect pairs
    held together only by boilerplate shingles to drop out)."""
    sh = (
        spread_input(df)
        .select(F.col(id_col).alias("id"), F.array_distinct(shingle_hashes(text_col, k)).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
    )
    exploded = sh.select("id", "n_sh", F.explode("sh").alias("s_hash"))
    if max_df is not None:
        freq = (
            exploded.groupBy("s_hash")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_df)
            .select("s_hash")
        )
        # co-partitioned with the self-join key (same shuffle column), so
        # AQE plans this as one exchange reused by both joins
        exploded = exploded.join(freq, "s_hash")
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
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 256,
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on 4 16-bit blocks (pigeonhole —
    any pair within hamming distance 3 shares at least one exact block),
    then verify the full hamming distance with bit_count.

    Same shape and safety valve as :func:`minhash_lsh_candidates`: one
    explode + groupBy per block bucket, in-bucket pairs via nested
    transform, ``max_bucket`` member cap with a ``truncated`` disclosure
    column — a degenerate block value (e.g. the all-zero signature of
    empty docs) stays bounded instead of going quadratic."""
    sig = spread_input(df).select(F.col(id_col).alias("id"), simhash64(text_col).alias("sim"))
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
    buckets = (
        blocks.groupBy("blk", "blk_val")
        .agg(F.sort_array(F.collect_list(F.struct("id", "sim"))).alias("members"))
        .where(F.size("members") >= 2)
    )
    bucket_truncated = (F.size("members") > max_bucket).alias("bucket_truncated")
    members = F.slice("members", 1, max_bucket)
    pair_struct = F.explode(
        F.flatten(
            F.transform(
                members,
                lambda x, i: F.transform(
                    F.slice(members, i + 2, max_bucket),
                    lambda y: F.struct(
                        x["id"].alias("id_a"),
                        y["id"].alias("id_b"),
                        F.bit_count(x["sim"].bitwiseXOR(y["sim"])).alias("hamming"),
                    ),
                ),
            )
        )
    )
    return (
        buckets.select(pair_struct.alias("p"), bucket_truncated)
        .where(F.col("p.hamming") <= max_hamming)
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(
            F.first(F.col("p.hamming")).alias("hamming"),
            F.max("bucket_truncated").alias("truncated"),
        )
    )

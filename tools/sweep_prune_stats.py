"""Measured pruning fractions for the dedup/ANN candidate generators at
a sweep corpus (the flood-guard calibration record).

For each bucketed candidate generator, report the candidate-pair count,
the pair space C(n, 2), the resulting pruning fraction, and how many
pairs rode a truncated (capped) bucket — the numbers BENCH/BASELINE.md
quotes when it says "the bucketing prunes >= X% of the pair space at
the 100x corpus".

Usage: python tools/sweep_prune_stats.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from logstash_filter_aggregate_spark import get_spark  # noqa: E402
from logstash_filter_aggregate_spark.operators import dedup, similarity  # noqa: E402


def stats(cand, n: int, truncated_col: str = "truncated") -> dict:
    agg = cand.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum(F.col(truncated_col).cast("long")).alias("truncated_pairs"),
    ).first()
    pair_space = n * (n - 1) / 2
    return {
        "n": n,
        "candidate_pairs": agg["pairs"],
        "truncated_pairs": int(agg["truncated_pairs"] or 0),
        "pair_space": pair_space,
        "candidate_frac": round(agg["pairs"] / pair_space, 8),
        "pruned_pct": round(100 * (1 - agg["pairs"] / pair_space), 4),
    }


def main(sf_dir: str, out_path: str | None) -> None:
    spark = get_spark(app_name="sweep_prune_stats")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs, n_vecs = docs.count(), embs.count()

    out = {"sf_dir": sf_dir, "docs": n_docs, "vectors": n_vecs}
    # the oracle queries' exact parameterizations (see __spark_entry__)
    out["minhash_lsh"] = stats(
        dedup.minhash_lsh_candidates(
            docs, k=3, num_hashes=16, bands=16, max_bucket=4096
        ),
        n_docs,
    )
    out["simhash"] = stats(
        dedup.simhash_near_dups(docs, max_hamming=10, max_bucket=8192), n_docs
    )
    out["embedding_near_dup"] = stats(
        similarity.embedding_near_dup_pairs(
            embs.select("vec_id", "embedding"),
            num_planes=8, min_cosine=0.99, max_bucket=8192,
        ),
        n_vecs,
    )
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sweep100"
    main(sf, sys.argv[2] if len(sys.argv) > 2 else None)

"""Synthesize a 100x dedup/ANN sweep corpus (500k docs / 200k vectors).

The 10x ``make_sf1`` corpus suffixes each replica's text, which leaves
cross-replica pairs near-identical: every base shingle appears in all
replicas, so the exact-jaccard oracle's shingle self-join grows with
replicas^2 (measured: dd_minhash_lsh 1400 s at 10x -> ~40 h naive at
100x; an intermediate Caesar-rotation design with ~4-replica rotation
classes still wedged a 64 GB driver on its straggler partitions). For
the 100x decade the document replicas are FULLY DECORRELATED instead:

- **documents**: replica ``r`` maps letters through a deterministic
  per-replica random permutation (seeded ``random.Random(r)`` — a char
  bijection, so shingle equality, text length, token boundaries and
  the intra-replica similarity structure are all preserved) and
  appends a short ``' q<r>'`` marker. Cross-replica shingles collide
  only by chance, so the exact >=0.6 relation and the shingle join
  scale LINEARLY in replicas — the same total join magnitude as the
  green 10x sweep.
- **planted cross-replica near-dups**: replica 1's first 500 docs keep
  replica 0's (identity) transform, differing only by the marker — a
  controlled population of genuinely cross-replica similar pairs the
  MinHash recall oracle must find, without quadratic join mass.
- **embeddings**: replica ``r`` cyclically shifts the 64-dim vector by
  ``r % 64`` coordinates (norm- and intra-replica-cosine-preserving;
  cross-replica cosines decay toward noise) plus a tiny
  first-coordinate nudge against exact ties.

Everything else is byte-copied at base scale: this corpus exists for
the dd_*/sim_* property-oracle families only (the full-suite scale
sweep is ``make_sf1``).

Usage: python tools/make_sweep100.py [dst] [replicas=100]
"""

from __future__ import annotations

import os
import random
import shutil
import string
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
LOW = string.ascii_lowercase
UPP = string.ascii_uppercase
PLANT_DOCS = 500  # replica-1 docs kept on the identity transform


def _perm(r: int) -> str:
    """Deterministic letter permutation for replica r (r=0: identity)."""
    if r == 0:
        return LOW
    letters = list(LOW)
    random.Random(r).shuffle(letters)
    return "".join(letters)


def main(dst: str, replicas: int = 100) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE perms (r BIGINT, low VARCHAR, upp VARCHAR)")
    con.executemany(
        "INSERT INTO perms VALUES (?, ?, ?)",
        [(r, _perm(r), _perm(r).upper()) for r in range(replicas)],
    )
    con.execute(f"""
        COPY (
          SELECT d.doc_id + p.r * 100000000 AS doc_id,
                 CASE
                   WHEN p.r = 0 THEN d.text
                   WHEN p.r = 1 AND d.doc_id < {PLANT_DOCS}
                     THEN d.text || ' q1'
                   ELSE translate(d.text, '{LOW}{UPP}', p.low || p.upp)
                        || ' q' || p.r
                 END AS text,
                 d.lang, d.source,
                 d.n_chars + CASE WHEN p.r = 0 THEN 0
                                  ELSE length(' q' || CAST(p.r AS VARCHAR)) END
                   AS n_chars
          FROM '{SRC}/documents.parquet' d, perms p
          ORDER BY p.r, d.doc_id
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT vec_id + r * 100000000 AS vec_id,
                 CAST(
                   list_concat(
                     [embedding[(r % 64) + 1] + r * 0.001],
                     list_concat(embedding[(r % 64) + 2:],
                                 embedding[:(r % 64)])
                   ) AS FLOAT[]) AS embedding,
                 label
          FROM '{SRC}/embeddings.parquet', range({replicas}) t(r)
          ORDER BY r, vec_id
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in ["documents", "embeddings"]:
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(t, n)
    d = con.execute(
        f"SELECT len(embedding), count(*) FROM '{dst}/embeddings.parquet' GROUP BY 1"
    ).fetchall()
    assert d == [(64, d[0][1])], d


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sweep100"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    main(dst, reps)

"""Synthesize a 100x dedup/ANN sweep corpus (500k docs / 200k vectors).

The 10x ``make_sf1`` corpus suffixes each replica's text, which leaves
cross-replica pairs near-identical: every base shingle appears in all
replicas, so the exact-jaccard oracle's shingle self-join grows with
replicas^2 (measured: dd_minhash_lsh 1400 s at 10x -> ~40 h at 100x).
For the 100x decade the replicas are DECORRELATED instead:

- **documents**: replica ``r`` Caesar-rotates letters by ``r % 26``
  (a char bijection — shingle equality, text length, token boundaries
  and the intra-replica similarity structure are all preserved) and
  appends a short ``' q<r>'`` marker so same-rotation replicas
  (r, r+26, ...) are near-identical but not equal. Cross-rotation
  shingles collide only by chance, so the exact >=0.6 relation and the
  shingle join scale ~linearly in replicas, while the ~4-replica
  rotation classes keep a planted population of genuinely-similar
  cross-replica pairs (the "quadratic-adjacent" candidate mass the
  flood guards are meant to police).
- **embeddings**: replica ``r`` cyclically shifts the 64-dim vector by
  ``r % 64`` coordinates (norm- and intra-replica-cosine-preserving;
  cross-replica cosines decay to noise) plus the 10x corpus's tiny
  first-coordinate nudge against exact ties.

Everything else is byte-copied at base scale: this corpus exists for
the dd_*/sim_* property-oracle families only (the full-suite scale
sweep is ``make_sf1``).

Usage: python tools/make_sweep100.py [dst] [replicas=100]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
LOW = "abcdefghijklmnopqrstuvwxyz"
UPP = LOW.upper()


def main(dst: str, replicas: int = 100) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT doc_id + r * 100000000 AS doc_id,
                 CASE WHEN r = 0 THEN text ELSE
                   translate(text,
                             '{LOW}{UPP}',
                             substr('{LOW}{LOW}', r % 26 + 1, 26)
                             || substr('{UPP}{UPP}', r % 26 + 1, 26))
                   || ' q' || r
                 END AS text,
                 lang, source,
                 n_chars + CASE WHEN r = 0 THEN 0
                                ELSE length(' q' || CAST(r AS VARCHAR)) END
                   AS n_chars
          FROM '{SRC}/documents.parquet', range({replicas}) t(r)
          ORDER BY r, doc_id
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

"""Synthesize an sf1-scale dataset (10x sf0.1) for the size sweep.

The driver ships parquet only up to sf0.1; this builds a deterministic
10-replica expansion of the three scalable tables under /tmp so
``tools/check_oracles.py`` can flush size-dependent bugs (bucket caps,
Arrow batch limits, timestamp precision) at 10x the data. Replicas are
id-shifted (disjoint users/docs/vecs, per-user temporal structure
preserved); document text gets a per-replica suffix (so dedup families
see distinct content, not 10 planted copies of everything) and
embeddings a tiny first-coordinate perturbation (so cosine top-k has no
cross-replica ties). Both engines read the SAME files, so oracle parity
stays exact. The dimension tables are byte-copied.

Usage: python tools/make_sf1.py [dst_dir]   (default /tmp/spark_graft_sf1)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main(dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT event_id + r * 1000000000 AS event_id, ts,
                 user_id + r * 1000000 AS user_id, event_type, value, props
          FROM '{SRC}/events.parquet', range(10) t(r)
          ORDER BY r, event_id
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT doc_id + r * 100000000 AS doc_id,
                 CASE WHEN r = 0 THEN text ELSE text || ' zr' || r END AS text,
                 lang, source,
                 n_chars + CASE WHEN r = 0 THEN 0 ELSE length(' zr' || CAST(r AS VARCHAR)) END AS n_chars
          FROM '{SRC}/documents.parquet', range(10) t(r)
          ORDER BY r, doc_id
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT vec_id + r * 100000000 AS vec_id,
                 CAST([embedding[1] + r * 0.001] || embedding[2:] AS FLOAT[]) AS embedding,
                 label
          FROM '{SRC}/embeddings.parquet', range(10) t(r)
          ORDER BY r, vec_id
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in ["events", "documents", "embeddings"]:
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1")

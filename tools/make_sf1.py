#!/usr/bin/env python3
"""Local scale-evidence harness: inflate the sf0.1 documents/embeddings
tables 10x into an sf1-shaped directory (LOCAL tooling only — the repo's
code never depends on this; testdata itself is read-only).

Replica k (1..9) offsets ids by k*100_000 (below every query's +1_000_000
twin-id offset) and appends a replica marker to text so the dedup
operators see realistic near-dup CLIQUES (a replica pair's Jaccard is
high but not 1.0) instead of byte-identical explosions. Embeddings are
replicated verbatim: the int8/IVF dedup paths then carry cosine-1 cliques
of 10, the dup-heavy-corpus worst case — exactly what a 100x scale gate
should stress.

Usage: python3 tools/make_sf1.py [srcDir] [outDir]
"""
import sys, os
import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPLICAS = 10
OFFSET = 100_000

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

docs = " UNION ALL ".join(
    f"""SELECT doc_id + {k * OFFSET} AS doc_id,
          text || {"''" if k == 0 else f"' replica{k}'"} AS text,
          lang, source,
          n_chars + {0 if k == 0 else 9} AS n_chars
        FROM '{SRC}/documents.parquet'"""
    for k in range(REPLICAS))
con.execute(f"COPY ({docs}) TO '{OUT}/documents.parquet' (FORMAT PARQUET)")

embs = " UNION ALL ".join(
    f"""SELECT vec_id + {k * OFFSET} AS vec_id, embedding, label
        FROM '{SRC}/embeddings.parquet'"""
    for k in range(REPLICAS))
con.execute(f"COPY ({embs}) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)")

for t in ("documents", "embeddings"):
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows -> {OUT}/{t}.parquet")

"""Generate a 10x scale-up of /root/testdata/sf0.1 for bench scaling runs.

VERDICT r3 "Next round" #7 asks for one scale-up datapoint: run bench.py
at sf1 (10x sf0.1) and verify no query scales worse than ~linear.  The
driver only ships sf{0.001,0.01,0.1}, so this tool derives sf1 from
sf0.1 by replicating every fact table 10x with key remapping — the
standard scale-out construction (each replica is a disjoint key range,
so join fan-outs and group cardinalities scale linearly, exactly how a
10x-bigger TPC-H run would look).  Dimension tables (region, nation)
stay fixed, as in TPC-H itself.

Replica handling per table:
  * all primary/foreign entity keys shift by replica*OFFSET so replicas
    never collide and referential integrity holds within a replica;
  * nation/region keys are NOT shifted (fixed dims, 25/5 rows);
  * timestamps are NOT shifted — a 10x-ingest-volume system sees 10x
    rows per time bucket, which is the scaling we want to measure;
  * documents get a per-replica token-list ROTATION (tokens shifted by
    r*7 positions) — exact or suffixed replicas would stay MinHash
    near-duplicates of each other, multiplying every duplicate cluster
    by 10 and pushing the pair-generating dedup ops superlinearly,
    which is NOT what a real 10x corpus looks like.  Rotation keeps
    every within-replica statistic (token/char counts, unigram freqs,
    intra-replica dup clusters) identical while destroying
    cross-replica shingle overlap;
  * embeddings get a per-replica coordinate rotation for the same
    reason — a cyclic coordinate shift is an orthogonal transform, so
    each replica is the SAME point cloud in a rotated basis
    (intra-replica cosine geometry exact), while a vector and its
    rotation are uncorrelated, so no cross-replica near-dup inflation
    (the first attempt used +r*1e-3 jitter and the near-dup ops came
    out 11.2x at 10x data — replicas were near-dups of each other).

Output is written to a repo-local, gitignored directory (default
scaledata/sf1).  This data feeds bench.py ONLY — the correctness gate
keeps using the driver's own parquet untouched.

Usage:  python tools/make_scale.py [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000  # > any sf0.1 key

# table -> (shifted key columns, extra per-replica SQL rewrites)
TABLES: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def build(out_dir: str, factor: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for table, keys in TABLES.items():
        src = f"read_parquet('{SRC}/{table}.parquet')"
        dst = os.path.join(out_dir, f"{table}.parquet")
        if not keys:  # fixed dimension table: single copy
            con.execute(f"COPY (SELECT * FROM {src}) TO '{dst}' (FORMAT PARQUET)")
            continue
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
        ]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + r.r * {OFFSET} AS {c}")
            elif table == "documents" and c == "text":
                # token-rotate by r*7 (mod len); r0 keeps the original
                # text so the sf0.1 corpus is a strict subset
                sel.append(
                    "CASE WHEN r.r = 0 THEN text ELSE ("
                    "SELECT array_to_string("
                    "  list_concat(t[1 + (r.r * 7) % greatest(len(t), 1):],"
                    "              t[:(r.r * 7) % greatest(len(t), 1)]), ' ')"
                    " FROM (SELECT string_split(text, ' ') AS t)"
                    ") END AS text"
                )
            elif table == "embeddings" and c == "embedding":
                sel.append(
                    "CASE WHEN r.r = 0 THEN embedding ELSE ("
                    "SELECT list_concat(e[1 + r.r:], e[:r.r])"
                    " FROM (SELECT embedding AS e)"
                    ") END AS embedding"
                )
            else:
                sel.append(c)
        q = (
            f"SELECT {', '.join(sel)} FROM {src} "
            f"CROSS JOIN (SELECT unnest(range({factor})) AS r) r"
        )
        con.execute(f"COPY ({q}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{table}: {n} rows -> {dst}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "scaledata/sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    build(out, factor)

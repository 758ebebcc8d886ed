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
  * documents get a per-replica suffix token and doc_id shift — exact
    replicas would multiply every duplicate cluster by 10 and push the
    pair-generating dedup ops quadratically (x100), which is NOT what a
    real 10x corpus looks like; a suffix keeps near-dup structure while
    making replicas distinct;
  * embeddings get per-replica deterministic jitter (+r*1e-3 per coord)
    for the same reason — identical vectors would collapse ANN scoring.

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
                # distinct per replica; r0 keeps the original text so the
                # sf0.1 corpus is a strict subset
                sel.append(
                    "CASE WHEN r.r = 0 THEN text"
                    " ELSE text || ' rep' || r.r END AS text"
                )
            elif table == "documents" and c == "n_chars":
                sel.append(
                    "CASE WHEN r.r = 0 THEN n_chars"
                    " ELSE n_chars + 5 END AS n_chars"
                )
            elif table == "embeddings" and c == "embedding":
                sel.append(
                    "list_transform(embedding,"
                    " x -> CAST(x + r.r * 0.001 AS FLOAT)) AS embedding"
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

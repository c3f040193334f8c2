"""Generate a local sf1-scale dataset by replicating sf0.1 ten times.

The driver testdata tops out at sf0.1 (~600k lineitem); the round-3 verdict
asks for one sf1 bench pass to show headline queries scale sub-linearly and
no plan flips to BNLJ/cartesian at 10x. This derives sf1 deterministically
from sf0.1 — no new random data, so the distributional shape (key skew,
selectivities, date ranges) is preserved exactly:

- region/nation: fixed dims, copied once.
- customer/supplier/part/orders/lineitem: 10 copies; every copy i offsets
  each key column by i * (max_key + 1) — referential integrity holds within
  a copy, so join fan-outs scale linearly like real TPC-H SF scaling.
- events: 10 copies, event_id/user_id offset (10x users, same time range —
  per-window counts scale 10x).
- documents: 10 copies, doc_id offset; text of copy i>0 gets a " c{i}"
  suffix so copies are NOT cross-copy duplicates — dedup workloads keep the
  per-copy duplicate structure instead of degenerating into 10-way identity
  groups (which would be a different, artificially skewed workload).
- embeddings: 10 copies, vec_id offset (ANN corpus 500 -> 5000).

Output: .localdata/sf1/*.parquet (gitignored).  Usage:
    python tools/make_sf1.py [--out DIR] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"

KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1"))
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")

    for t, keys in KEYS.items():
        src = f"'{SRC}/{t}.parquet'"
        # per-key offset stride: max+1 so copies never collide
        strides = {
            k: con.execute(f"SELECT MAX({k}) + 1 FROM {src}").fetchone()[0]
            for k in keys
        }
        cols = [c[0] for c in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()]
        selects = []
        for i in range(args.copies):
            proj = []
            for c in cols:
                if c in strides:
                    proj.append(f"{c} + {i * strides[c]} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    proj.append(f"text || ' c{i}' AS text")
                else:
                    proj.append(c)
            selects.append(f"SELECT {', '.join(proj)} FROM {src}")
        union = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({union}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{args.out}/{t}.parquet'").fetchone()[0]
        print(t, n, "rows")


if __name__ == "__main__":
    main()

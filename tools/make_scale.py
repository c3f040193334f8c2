"""Scale up driver testdata by integer replication with key striding.

Produces an sfN directory (default 10x sf0.1 -> "sf1") for scale validation
of bench.py plans. Replica 0 is the identity, so the source data is a subset
of the output. Foreign keys are shifted by the same stride on both sides, so
join fan-outs and per-key cardinalities are preserved exactly; result sets of
key-joined aggregations scale linearly with the replication factor.

Two columns need care so pair-generating operators scale linearly instead of
quadratically:
  - documents.text: each replica r>0 applies a distinct vowel-translation, so
    replicas of the same doc share no shingles -> minhash/jaccard/simhash pair
    counts scale 10x, not 45x-per-doc.
  - embeddings.embedding: each replica r>0 cyclically rotates the vector, so
    replicas are not mutual cosine near-dups while norm/distribution are kept.

Usage: python tools/make_scale.py [--factor 10] [--src /root/testdata/sf0.1]
                                  [--out /tmp/sfscale/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

STRIDE = 10_000_000

# per-replica vowel substitution cycles; replica 0 is identity
VOWS = "aeiou"
SUBS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
        "eaiuo", "ieuoa", "oiaue", "uoeia", "aoeui"]


def replicate(con: duckdb.DuckDBPyConnection, src: str, out: str,
              table: str, factor: int, select_fn) -> None:
    parts = []
    for r in range(factor):
        parts.append(select_fn(r, f"'{src}/{table}.parquet'"))
    union = " UNION ALL ".join(parts)
    con.execute(f"COPY ({union}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfscale/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    f, src, out = args.factor, args.src, args.out
    # beyond 10 replicas the vowel-substitution cycle (and the 16-step
    # embedding rotation) would wrap back to identity, silently
    # reintroducing the cross-replica near-dups this script exists to avoid
    if f > len(SUBS):
        raise SystemExit(
            f"--factor {f} > {len(SUBS)}: replica {len(SUBS)} would reuse the "
            "identity substitution; extend SUBS before scaling further"
        )

    # fixed dims: copy through unchanged
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    replicate(con, src, out, "customer", f, lambda r, p: f"""
        SELECT c_custkey + {r * STRIDE} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment FROM {p}""")
    replicate(con, src, out, "supplier", f, lambda r, p: f"""
        SELECT s_suppkey + {r * STRIDE} AS s_suppkey, s_name, s_nationkey,
               s_acctbal FROM {p}""")
    replicate(con, src, out, "part", f, lambda r, p: f"""
        SELECT p_partkey + {r * STRIDE} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice FROM {p}""")
    replicate(con, src, out, "orders", f, lambda r, p: f"""
        SELECT o_orderkey + {r * STRIDE} AS o_orderkey,
               o_custkey + {r * STRIDE} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {p}""")
    replicate(con, src, out, "lineitem", f, lambda r, p: f"""
        SELECT l_orderkey + {r * STRIDE} AS l_orderkey,
               l_partkey + {r * STRIDE} AS l_partkey,
               l_suppkey + {r * STRIDE} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate FROM {p}""")
    replicate(con, src, out, "events", f, lambda r, p: f"""
        SELECT event_id + {r * STRIDE} AS event_id, ts,
               user_id + {r * STRIDE} AS user_id, event_type, value, props
        FROM {p}""")
    replicate(con, src, out, "documents", f, lambda r, p: f"""
        SELECT doc_id + {r * STRIDE} AS doc_id,
               translate(text, '{VOWS}', '{SUBS[r % len(SUBS)]}') AS text,
               lang, source, n_chars FROM {p}""")
    replicate(con, src, out, "embeddings", f, lambda r, p: f"""
        SELECT vec_id + {r * STRIDE} AS vec_id,
               CASE WHEN {r} = 0 THEN embedding
                    ELSE list_concat(embedding[{r % 16 + 1}:],
                                     embedding[:{r % 16}]) END AS embedding,
               label FROM {p}""")


if __name__ == "__main__":
    main()

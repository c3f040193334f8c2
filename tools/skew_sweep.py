"""Hot-key skew robustness sweep: rebuild the dataset so ~50% of each fact
table's foreign-key rows collapse onto ONE hot key, then run every registry
query through the full Spark-vs-DuckDB value compare on the skewed data.

Why this exists: the oracle gate's testdata has near-uniform key
distributions, but production corpora are power-law — one user, one
domain, one order id can carry half the rows. Uniform-data greens don't
prove the operators stay *correct* when a groupBy partition, a window
partition, or a join side is 1000x its median size (wrong-answer modes:
overflow in a partial aggregate, a window frame assuming small partitions,
a join strategy flipped by AQE mid-plan). This sweep is compare-based —
row count + schema + sorted-value equality via tools/check_correctness —
not crash-only, so a skew-triggered wrong answer fails loudly.

The remap is deterministic (hash of the key value gates which keys
collapse), preserves referential integrity (the hot key is the MIN of the
referenced dimension's primary key, which always exists), and leaves
primary keys, timestamps, payloads, and embeddings untouched — join
topology changes only in *distribution*, never in validity.

Skewed columns:
  lineitem.l_orderkey -> min(o_orderkey)   (self-join + groupBy hot key)
  lineitem.l_suppkey  -> min(s_suppkey)
  lineitem.l_partkey  -> min(p_partkey)
  orders.o_custkey    -> min(c_custkey)
  customer.c_nationkey-> min(n_nationkey)
  events.user_id      -> min(user_id)      (streaming state + window skew)
  documents.source    -> modal source      (strata / mixing / sharding skew)

Usage:
    python tools/skew_sweep.py [--sf DIR] [--frac 0.5] [--only a,b]
    python tools/skew_sweep.py --bench   # salted-join timings for SCALE.md
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from check_correctness import compare, duckdb_conn  # noqa: E402


def _gate(col, frac: float):
    """Deterministic per-key gate: True for ~frac of distinct key values."""
    from pyspark.sql import functions as F

    mod = 1000
    return (
        F.pmod(F.abs(F.hash(F.col(col).cast("string"), F.lit("skew"))), F.lit(mod))
        < int(round(frac * mod))
    )


def build_skewed_dataset(spark, src_sf: str, frac: float = 0.5) -> str:
    from pyspark.sql import functions as F

    from qurious_spark.sources.readers import TPCH_TABLES, read_parquet

    out = tempfile.mkdtemp(prefix="qurious_skew_sf_")

    def _min_of(table: str, col: str):
        df = read_parquet(spark, os.path.join(src_sf, f"{table}.parquet"))
        return df.agg(F.min(col)).collect()[0][0]

    hot = {
        "o_orderkey": _min_of("orders", "o_orderkey"),
        "s_suppkey": _min_of("supplier", "s_suppkey"),
        "p_partkey": _min_of("part", "p_partkey"),
        "c_custkey": _min_of("customer", "c_custkey"),
        "n_nationkey": _min_of("nation", "n_nationkey"),
        "user_id": _min_of("events", "user_id"),
    }
    docs = read_parquet(spark, os.path.join(src_sf, "documents.parquet"))
    modal_source = (
        docs.groupBy("source").count().orderBy(F.desc("count"), "source").first()[0]
    )

    remap: dict[str, list[tuple[str, object]]] = {
        "lineitem": [
            ("l_orderkey", hot["o_orderkey"]),
            ("l_suppkey", hot["s_suppkey"]),
            ("l_partkey", hot["p_partkey"]),
        ],
        "orders": [("o_custkey", hot["c_custkey"])],
        "customer": [("c_nationkey", hot["n_nationkey"])],
        "events": [("user_id", hot["user_id"])],
        "documents": [("source", modal_source)],
    }

    for t in TPCH_TABLES:
        df = read_parquet(spark, os.path.join(src_sf, f"{t}.parquet"))
        for col, hot_val in remap.get(t, []):
            orig_type = dict(df.dtypes)[col]
            df = df.withColumn(
                col,
                F.when(_gate(col, frac), F.lit(hot_val).cast(orig_type)).otherwise(
                    F.col(col)
                ),
            )
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    return out


def run_sweep(args) -> int:
    import __spark_entry__ as entry_mod
    from qurious_spark.session import get_spark

    spark = get_spark()
    skew_sf = build_skewed_dataset(spark, args.sf, args.frac)
    print(f"skewed dataset at {skew_sf} (frac={args.frac}, src={args.sf})")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    con = duckdb_conn(skew_sf)

    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, skew_sf)
            if name not in oracles:
                cnt = df.count()
                print(f"ROWSONLY {name}: {cnt} rows ({time.time()-t0:.1f}s)")
                n_rows_only += 1
                continue
            problems, _ = compare(name, df, con, oracles[name])
        except Exception as e:  # noqa: BLE001 - the sweep's whole point
            problems = [f"EXCEPTION {type(e).__name__}: {str(e).splitlines()[0][:200]}"]
        if problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"  - {p}")
        else:
            n_pass += 1
            print(f"PASS {name} ({time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if failures:
        print("FAILED: " + ", ".join(failures))
    return 1 if n_fail else 0


def run_bench(args) -> int:
    """Time the three join strategies on a hot-key fact/dim join.

    Broadcast is disabled to model the 100 TB regime where the dimension
    is too large to replicate to every executor — exactly the regime
    salted_join targets (operators/skew.py docstring). On local[32] with
    broadcast allowed, Spark would trivially broadcast the dim and hide
    the skew; that would benchmark nothing.
    """
    from pyspark.sql import functions as F

    from qurious_spark.operators.skew import salted_join
    from qurious_spark.session import get_spark
    from qurious_spark.sources.readers import read_parquet

    spark = get_spark()
    sf = args.sf_bench
    ev = read_parquet(spark, os.path.join(sf, "events.parquet"))
    hot = ev.agg(F.min("user_id")).collect()[0][0]
    # ~frac of distinct users collapse onto `hot` — same gate as the sweep
    skewed = ev.withColumn(
        "user_id", F.when(_gate("user_id", args.frac), F.lit(hot)).otherwise(F.col("user_id"))
    )
    dim = (
        ev.select("user_id")
        .distinct()
        .withColumn("segment", F.pmod(F.col("user_id"), F.lit(17)))
    )
    skewed.write.mode("overwrite").parquet("/tmp/qurious_skew_bench_fact")
    dim.write.mode("overwrite").parquet("/tmp/qurious_skew_bench_dim")
    fact = spark.read.parquet("/tmp/qurious_skew_bench_fact")
    dim = spark.read.parquet("/tmp/qurious_skew_bench_dim")
    n_fact = fact.count()
    print(f"bench fact rows={n_fact}, hot user carries ~{args.frac:.0%}")

    def timed(label: str, thunk, **conf):
        saved = {k: spark.conf.get(k, None) for k in conf}
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            t0 = time.time()
            n = thunk().count()
            dt = time.time() - t0
            print(f"{label}: {dt:.2f}s ({n} rows)")
            return dt
        finally:
            for k, v in saved.items():
                if v is not None:
                    spark.conf.set(k, v)

    no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    timed(
        "sort-merge join, AQE skew handling OFF",
        lambda: fact.join(dim, "user_id"),
        **no_bcast,
        **{
            "spark.sql.adaptive.skewJoin.enabled": "false",
            "spark.sql.adaptive.enabled": "true",
        },
    )
    timed(
        "sort-merge join, AQE skew handling ON ",
        lambda: fact.join(dim, "user_id"),
        **no_bcast,
        **{
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
            "spark.sql.adaptive.enabled": "true",
        },
    )
    timed(
        "salted_join (16 buckets)            ",
        lambda: salted_join(fact, dim.withColumnRenamed("user_id", "d_user_id"),
                            ("user_id", "d_user_id"), salt_buckets=16),
        **no_bcast,
    )
    return 0


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--sf-bench", default="/root/testdata/sf0.1")
    ap.add_argument("--frac", type=float, default=0.5)
    ap.add_argument("--only", default=None)
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args(argv)
    if args.bench:
        return run_bench(args)
    return run_sweep(args)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

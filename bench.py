"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {"q1": sec, ...}, "sf": ...}

The per-query time is wall-clock for plan + execute + collect of the final
(small, aggregated) result. A parquet-scan warmup runs first so JVM/codegen
startup is not attributed to the first query.

Noise control: the observed idle-box run-to-run spread on the suite total is
±10-15% (18.4-24.0s across rounds 3-4 at sf0.1), so a single timed pass can
misread as a regression. The harness therefore runs BENCH_REPEATS timed
passes (default 3) after warmup and reports the MEDIAN pass, per-query times
taken from that same pass. The machine must be otherwise idle.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "tpch_q1",
    "tpch_q2",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "agg_distinct",
    "window_row_number",
    "dedup_exact",
    "dedup_minhash_pairs",
    "ann_topk_bruteforce",
    "text_quality",
    "events_tumbling_window",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    # local test files are ~11 MB; split smaller so the scan uses the cores
    # (cluster deployments keep Spark's 128m default — see session.get_spark)
    os.environ.setdefault("SPARK_GRAFT_MAX_PARTITION_BYTES", "2m")

    from qurious_spark.session import get_spark
    import qurious_spark.queries as q

    q.load_all()
    spark = get_spark()

    # warmup: file listing first, then one untimed pass over every headline
    # query so whole-stage-codegen compilation + JVM JIT (a one-time,
    # per-plan-shape cost that amortizes to nothing at scale) is not
    # attributed to the timed pass.
    q.ensure_views(spark, sf_dir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    names = [n for n in HEADLINE if n in q.REGISTRY]
    for name in names:
        q.REGISTRY[name](spark, sf_dir).collect()

    # drop warmup-persisted frames and settle the JVM heap so the first timed
    # query doesn't absorb warmup garbage-collection debt
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    time.sleep(1)

    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "3")))
    passes: list[tuple[float, dict[str, float]]] = []
    for i in range(repeats):
        per_query: dict[str, float] = {}
        total = 0.0
        for name in names:
            t0 = time.time()
            df = q.REGISTRY[name](spark, sf_dir)
            rows = df.collect()
            dt = time.time() - t0
            per_query[name] = round(dt, 3)
            total += dt
            if i == 0:
                print(f"# {name}: {dt:.3f}s ({len(rows)} rows)", file=sys.stderr)
        passes.append((total, per_query))
        print(f"# pass {i + 1}/{repeats}: {total:.3f}s", file=sys.stderr)

    # median pass (by suite total); its per-query times are self-consistent
    total, per_query = sorted(passes, key=lambda p: p[0])[len(passes) // 2]
    print(
        json.dumps(
            {
                "metric": "headline_suite_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "passes": [round(t, 3) for t, _ in passes],
            }
        )
    )


if __name__ == "__main__":
    main()

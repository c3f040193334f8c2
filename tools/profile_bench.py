"""Per-query time breakdown for the headline bench (guide §1: measure first).

For each headline query at $SPARK_GRAFT_SF_DIR, after a full warmup pass:
  build_s    — construct the DataFrame (SQL parse + analysis for sql_query
               entries; reader/setup work for df_query entries)
  exec1_s    — first .collect() of that frame (optimize + codegen + execute)
  exec2_s    — second .collect() of the SAME frame (re-optimize + execute;
               codegen cache warm) — exec1 - exec2 ≈ per-plan-shape compile
  jobs/tasks — Spark jobs and launched tasks during exec1 (statusTracker)

Prints one JSON line per query plus a totals line. Run on an idle box.

Usage: python tools/profile_bench.py [--repeats 2] [--only a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    # scan split: Spark 128m default (single-row-group files; see bench.py)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    import qurious_spark.queries as q
    from qurious_spark.session import get_spark

    q.load_all()
    spark = get_spark()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    names = [n for n in HEADLINE if n in q.REGISTRY]
    if args.only:
        names = [n for n in args.only.split(",") if n in q.REGISTRY]

    # warmup: codegen + JIT for every plan shape
    q.ensure_views(spark, sf_dir)
    spark.sql("SELECT count(*) FROM lineitem").collect()
    for name in names:
        q.REGISTRY[name](spark, sf_dir).collect()
    spark.catalog.clearCache()

    rows = []
    for name in names:
        best = None
        for _ in range(args.repeats):
            t0 = time.time()
            df = q.REGISTRY[name](spark, sf_dir)
            t1 = time.time()
            jobs_before = set(tracker.getJobIdsForGroup(None) or [])
            df.collect()
            t2 = time.time()
            df.collect()
            t3 = time.time()
            jobs_after = set(tracker.getJobIdsForGroup(None) or [])
            n_tasks = 0
            for jid in jobs_after - jobs_before:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None:
                        n_tasks += si.numTasks
            rec = {
                "query": name,
                "build_s": round(t1 - t0, 3),
                "exec1_s": round(t2 - t1, 3),
                "exec2_s": round(t3 - t2, 3),
                "jobs": len(jobs_after - jobs_before),
                "tasks": n_tasks,
            }
            if best is None or rec["build_s"] + rec["exec1_s"] < best["build_s"] + best["exec1_s"]:
                best = rec
        rows.append(best)
        print(json.dumps(best), flush=True)

    tot_build = round(sum(r["build_s"] for r in rows), 2)
    tot_e1 = round(sum(r["exec1_s"] for r in rows), 2)
    tot_e2 = round(sum(r["exec2_s"] for r in rows), 2)
    print(
        json.dumps(
            {
                "total_build_s": tot_build,
                "total_exec1_s": tot_e1,
                "total_exec2_s": tot_e2,
                "total_build_plus_exec1": round(tot_build + tot_e1, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

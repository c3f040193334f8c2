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

Self-defense against post-gate box state (VERDICT r10 task 1): the driver
benches minutes after its own 50-query correctness gate, exactly the
post-load page-cache state BASELINE.md's protocol says to discard (BENCH_r10
read 25.1s, 1.31x the idle tree, with 26/29 queries inflated together).
Before the timed passes the harness now (a) explicitly re-warms the OS page
cache by reading every byte of $SPARK_GRAFT_SF_DIR/*.parquet — the "cat
trick" that restored 19.24s in the r9 battery — and (b) records a `context`
sidecar in the JSON line (1-min loadavg + a timed warm-read throughput
probe) so an inflated reading is self-diagnosing instead of protocol-bound.

Wait-for-idle (VERDICT r11 task 1): diagnosing was not enough — BENCH_r11
recorded 31.2s with loadavg_start 7.55 on a tree whose healthy-window
median is 19.78s. So after the rewarm, if the box looks unhealthy
(loadavg_start >= BENCH_IDLE_LOAD_MAX [2.0], warm re-read below
BENCH_IDLE_WARM_MB_S [2000 MB/s], or the sha256 CPU probe below
BENCH_IDLE_SHA_MB_S [800 MB/s]), the harness sleeps in 60s steps for up to
BENCH_IDLE_WAIT_SEC [600s] total, re-probing each step and proceeding at
the first healthy probe (or after the budget, with the best probe found).
The wait and the probe series are recorded in `context` so the artifact
proves either "benched in a healthy window" or "the box never offered one".

Multi-core gate (r12): one degraded window passed EVERY single-thread probe
(sha256 1.1 GB/s, pyloop 0.18s, warm-read 2.1 GB/s, load 0.23) yet ran the
32-core suite ~1.8x slow — the hypervisor was granting ~5 effective cores
(32-thread sha256 aggregated 4.7x the single-thread rate; /proc/stat steal
>1e6 jiffies). The probe set therefore includes a GIL-releasing 32-thread
sha256 fan-out and a steal-time sample; the health gate additionally
requires cpu_mt_scale >= BENCH_IDLE_MT_EFF [0.25] x thread count.
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


def _rewarm_page_cache(sf_dir: str) -> dict[str, float]:
    """Read every byte of the benchmark inputs twice and report throughput.

    Pass 1 pulls the parquet back into the OS page cache (evicted by
    whatever ran before us — the driver's correctness gate, a fuzz soak);
    pass 2 re-reads from the now-warm cache as a box-state probe: a warm
    re-read far below memory bandwidth (< ~1 GB/s) means the box is under
    memory pressure and the suite total should be read with that context.
    """
    paths: list[str] = []
    for root, _dirs, files in os.walk(sf_dir):
        paths.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))

    def read_all() -> tuple[float, int]:
        t0 = time.time()
        n = 0
        for p in sorted(paths):
            with open(p, "rb", buffering=0) as fh:
                while True:
                    chunk = fh.read(1 << 22)
                    if not chunk:
                        break
                    n += len(chunk)
        return time.time() - t0, n

    rewarm_sec, nbytes = read_all()
    probe_sec, _ = read_all()
    mb = nbytes / 1e6
    return {
        "input_mb": round(mb, 1),
        "rewarm_sec": round(rewarm_sec, 3),
        "rewarm_mb_s": round(mb / rewarm_sec, 1) if rewarm_sec > 0 else -1.0,
        "warm_read_mb_s": round(mb / probe_sec, 1) if probe_sec > 0 else -1.0,
    }


def _cpu_probe() -> dict[str, float]:
    """Time three fixed workloads: a C-speed single-thread one (sha256 over
    64 MB — memory-bandwidth sensitive), a pure-Python loop (interpreter/
    scheduler sensitive), and the SAME sha256 work fanned across every core
    (hashlib releases the GIL on >2 KiB buffers, so threads scale).

    The single-thread probes catch host degradation that slows each core;
    the multi-core probe catches the OPPOSITE failure this box exhibits
    under co-tenant pressure: every 1-thread probe reads healthy (sha256
    ~1.06 GB/s, pyloop 0.18s) while 32 threads aggregate only ~5 GB/s —
    4.7x scaling on a 32-CPU guest, i.e. the hypervisor is granting ~5
    effective cores (confirmed by >1e6 steal jiffies in /proc/stat) and the
    32-core suite reads ~1.8x inflated. `cpu_mt_scale` = aggregate/single
    throughput ratio; `cpu_steal_pct` = steal share over a 0.5s window."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    buf = b"\x5a" * (1 << 20)

    def sha_mb(n_mb: int) -> float:
        h = hashlib.sha256()
        for _ in range(n_mb):
            h.update(buf)
        return float(n_mb)

    t0 = time.time()
    sha_mb(64)
    sha_sec = time.time() - t0
    t0 = time.time()
    x = 0
    for i in range(5_000_000):
        x += i
    loop_sec = time.time() - t0

    nthreads = min(32, os.cpu_count() or 1)
    t0 = time.time()
    with ThreadPoolExecutor(nthreads) as ex:
        total = sum(ex.map(sha_mb, [64] * nthreads))
    mt_sec = time.time() - t0
    single = 64 / sha_sec if sha_sec > 0 else -1.0
    aggregate = total / mt_sec if mt_sec > 0 else -1.0

    steal_pct = -1.0
    try:
        def _stat() -> tuple[int, int]:
            with open("/proc/stat") as fh:
                f = fh.readline().split()
            vals = [int(v) for v in f[1:]]
            steal = vals[7] if len(vals) > 7 else 0
            return steal, sum(vals)

        s0, t0_j = _stat()
        time.sleep(0.5)
        s1, t1_j = _stat()
        if t1_j > t0_j:
            steal_pct = round(100.0 * (s1 - s0) / (t1_j - t0_j), 1)
    except OSError:
        pass

    return {
        "cpu_sha256_mb_s": round(single, 1),
        "cpu_pyloop_sec": round(loop_sec, 3),
        "cpu_mt_sha256_mb_s": round(aggregate, 1),
        "cpu_mt_threads": float(nthreads),
        "cpu_mt_scale": round(aggregate / single, 2) if single > 0 else -1.0,
        "cpu_steal_pct": steal_pct,
    }


def _healthy(load: float, context: dict[str, float]) -> bool:
    """True when the box looks like the idle window BASELINE.md's protocol
    requires: low ambient load AND both single-thread throughput probes in
    the healthy band observed across rounds 3-11 (warm re-read ~2.3-2.6
    GB/s, sha256 ~1.0-1.1 GB/s on this box) AND the multi-core probe scales
    — per thread the floor is BENCH_IDLE_MT_EFF (default 0.25, i.e. >=8x
    aggregate scaling on 32 threads; the probe-blind degraded window this
    gate was added for measured 4.7x while every single-thread probe read
    healthy and the suite ran ~1.8x slow). Entries absent from ``context``
    (e.g. the hand-built frames in tests) skip their gate."""
    mt_scale = context.get("cpu_mt_scale")
    mt_threads = context.get("cpu_mt_threads", 32.0)
    mt_ok = (
        mt_scale is None
        or mt_scale < 0
        or mt_scale
        >= float(os.environ.get("BENCH_IDLE_MT_EFF", "0.25")) * mt_threads
    )
    return (
        load < float(os.environ.get("BENCH_IDLE_LOAD_MAX", "2.0"))
        and context["warm_read_mb_s"] >= float(os.environ.get("BENCH_IDLE_WARM_MB_S", "2000"))
        and context["cpu_sha256_mb_s"] >= float(os.environ.get("BENCH_IDLE_SHA_MB_S", "800"))
        and mt_ok
    )


def main() -> None:
    # sample load BEFORE any Spark work: the warmup pass itself drives the
    # 1-min loadavg to ~4+, so a post-warmup sample can't distinguish "box
    # was busy when the bench started" from "the bench is running"
    loadavg_start = round(os.getloadavg()[0], 2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    # Scan split size stays at Spark's 128m default (session.get_spark).
    # Benchmarks used to force 2m here "so the scan uses the cores", but
    # every testdata table is ONE parquet file with ONE row group — the row
    # group is the minimum split unit, so smaller splits never widened the
    # scan; they only fabricated empty tasks (~5 per scan stage). Removing
    # the override measured 0.3-0.7 s/pass faster (OPTIMIZATION_r12.md) and
    # matches the cluster-right default. SPARK_GRAFT_MAX_PARTITION_BYTES
    # remains honored for perturbation gates and cluster tuning.

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

    # explicit page-cache rewarm + box-state probe (see module docstring)
    context = _rewarm_page_cache(sf_dir)
    context.update(_cpu_probe())
    context["loadavg_start"] = loadavg_start
    context["loadavg_1m"] = round(os.getloadavg()[0], 2)

    # wait-for-idle (VERDICT r11 task 1; see module docstring). The FIRST
    # health check gates on the pre-Spark load sample — our own warmup pass
    # drives the 1-min loadavg to ~4+, so the post-warmup sample can't
    # distinguish ambient load from the bench itself. Once >=60s of sleep
    # has elapsed, fresh samples are meaningful again (our residue decays
    # by ~e per idle minute) and the loop gates on those.
    wait_budget = float(os.environ.get("BENCH_IDLE_WAIT_SEC", "600"))
    step = 60.0
    waited = 0.0
    load_gate = loadavg_start
    probes: list[dict[str, float]] = []
    # NOTE: the while-loop body below also appends the mt/steal fields to
    # the probe series so a budget-exhausted artifact shows WHICH gate held.
    while waited + step <= wait_budget and not _healthy(load_gate, context):
        print(
            f"# box unhealthy (load {load_gate}, warm-read "
            f"{context['warm_read_mb_s']} MB/s, sha256 "
            f"{context['cpu_sha256_mb_s']} MB/s, mt-scale "
            f"{context.get('cpu_mt_scale', -1.0)}x/"
            f"{int(context.get('cpu_mt_threads', 0))}t, steal "
            f"{context.get('cpu_steal_pct', -1.0)}%); sleeping {int(step)}s "
            f"({int(waited)}s of {int(wait_budget)}s budget used)",
            file=sys.stderr,
        )
        time.sleep(step)
        waited += step
        context = _rewarm_page_cache(sf_dir)
        context.update(_cpu_probe())
        load_gate = round(os.getloadavg()[0], 2)
        context["loadavg_start"] = loadavg_start
        context["loadavg_1m"] = load_gate
        probes.append(
            {
                "at_sec": int(waited),
                "loadavg": load_gate,
                "warm_read_mb_s": context["warm_read_mb_s"],
                "cpu_sha256_mb_s": context["cpu_sha256_mb_s"],
                "cpu_mt_scale": context.get("cpu_mt_scale", -1.0),
                "cpu_steal_pct": context.get("cpu_steal_pct", -1.0),
            }
        )
    context["idle_wait_sec"] = int(waited)
    context["idle_healthy"] = _healthy(load_gate, context)
    if probes:
        context["idle_wait_probes"] = probes
    print(f"# context: {json.dumps(context)}", file=sys.stderr)

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
                "context": context,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Pin bench.py's wait-for-idle health gate (VERDICT r11 task 1).

The timed-pass loop itself needs a live box and is exercised by every
bench run; what must not drift silently are the thresholds that decide
"healthy window" — they encode the calibrated idle band of this box
(warm re-read 2.3-2.6 GB/s, sha256 ~1.0-1.1 GB/s, ambient load < 2).
"""

import importlib
import sys


def _bench(monkeypatch):
    monkeypatch.syspath_prepend("/root/repo")
    if "bench" in sys.modules:
        return importlib.reload(sys.modules["bench"])
    import bench

    return bench


def test_healthy_thresholds(monkeypatch):
    bench = _bench(monkeypatch)
    good = {"warm_read_mb_s": 2400.0, "cpu_sha256_mb_s": 1070.0}
    assert bench._healthy(0.8, good)
    # the exact BENCH_r11 degraded-window signature: healthy probes,
    # loadavg_start 7.55 — the load gate alone must reject it
    assert not bench._healthy(7.55, good)
    assert not bench._healthy(0.8, {"warm_read_mb_s": 1900.0, "cpu_sha256_mb_s": 1070.0})
    assert not bench._healthy(0.8, {"warm_read_mb_s": 2400.0, "cpu_sha256_mb_s": 700.0})


def test_healthy_multicore_scaling_gate(monkeypatch):
    """The r12 probe-blind signature: every single-thread probe healthy,
    32-thread sha256 aggregate only 4.7x single (hypervisor granting ~5
    effective cores, suite ~1.8x slow) — the mt gate alone must reject it."""
    bench = _bench(monkeypatch)
    base = {"warm_read_mb_s": 2400.0, "cpu_sha256_mb_s": 1070.0}
    degraded = dict(base, cpu_mt_scale=4.7, cpu_mt_threads=32.0)
    assert not bench._healthy(0.23, degraded)
    healthy = dict(base, cpu_mt_scale=12.0, cpu_mt_threads=32.0)
    assert bench._healthy(0.23, healthy)
    # probe unavailable (-1) or absent must not block the gate
    assert bench._healthy(0.23, dict(base, cpu_mt_scale=-1.0))
    assert bench._healthy(0.23, base)
    # floor scales with thread count (8-thread guest: 4.7x is fine)
    assert bench._healthy(0.23, dict(base, cpu_mt_scale=4.7, cpu_mt_threads=8.0))
    # env-overridable like the other thresholds
    monkeypatch.setenv("BENCH_IDLE_MT_EFF", "0.10")
    assert bench._healthy(0.23, degraded)


def test_healthy_thresholds_env_overridable(monkeypatch):
    bench = _bench(monkeypatch)
    ctx = {"warm_read_mb_s": 2400.0, "cpu_sha256_mb_s": 1070.0}
    monkeypatch.setenv("BENCH_IDLE_LOAD_MAX", "8.0")
    assert bench._healthy(7.55, ctx)
    monkeypatch.setenv("BENCH_IDLE_WARM_MB_S", "3000")
    assert not bench._healthy(0.5, ctx)

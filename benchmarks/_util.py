"""Shared timing/reporting helpers for the benchmark scripts.

Each benchmarks/bench_*.py prints one JSON line per metric in the same
shape as the driver's bench.py:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
Run on whatever backend is ambient (the TPU through the axon tunnel in
this image; pass --cpu to force CPU). NB: only ONE process can hold the
TPU through the tunnel — serialize TPU runs.
"""

from __future__ import annotations

import json
import time


def force_cpu_if_flagged(argv):
    if "--cpu" in argv:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
        argv.remove("--cpu")
    return argv


def best_time(fn, *args, reps=5, warmup=1):
    """Best wall time of fn(*args) with block_until_ready, after warmup."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def report(metric, value, unit, baseline=None):
    line = {"metric": metric, "value": value, "unit": unit}
    if baseline:
        line["vs_baseline"] = value / baseline
    print(json.dumps(line))


def pipelined_time(fn, *args, calls=8, warmup=1):
    """Total wall time of `calls` back-to-back dispatches with ONE final
    block_until_ready — bench.py's throughput methodology (a serialized
    per-call loop pays full tunnel dispatch latency per call and can
    understate throughput ~2x on big programs)."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(calls):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / calls

"""Shared benchmark harness: device-honest timing via scalar-checksum
syncs (dev tunnels make block_until_ready/full fetches unreliable), warmup
+ repeat loops, one-line reports."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def setup_jax(cpu: bool = False):
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    return jax


def bench_device(label: str, fn, *args, seconds: float = 2.0, unit_count: int = 1):
    """Time a jitted fn whose return reduces to a scalar on device.
    Prints ms/call and unit throughput."""
    import jax

    jfn = jax.jit(fn)
    float(jfn(*args))  # warm / compile
    t0 = time.time()
    it = 0
    while time.time() - t0 < seconds or it < 3:
        float(jfn(*args))
        it += 1
    dt = (time.time() - t0) / it
    rate = unit_count / dt
    print(f"{label:55s} {dt * 1e3:10.3f} ms   {rate:14.0f} /s")
    return dt


def bench_host(label: str, fn, seconds: float = 2.0, unit_count: int = 1):
    """Time a host-side callable end to end."""
    fn()  # warm
    t0 = time.time()
    it = 0
    while time.time() - t0 < seconds or it < 2:
        fn()
        it += 1
    dt = (time.time() - t0) / it
    print(f"{label:55s} {dt * 1e3:10.3f} ms   {unit_count / dt:14.0f} /s")
    return dt

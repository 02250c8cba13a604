"""Microbench: XLA row-gather rate vs MXU matmul rate on the real TPU.

Measures the two primitives that bound serving QPS and build throughput:
- random row gather from a [N, d] table at various N/d/dtype
- batched distance matmul (the flat-search MXU path)

Sync protocol per DEVNOTES.md: on-device scalar checksum fetch, persistent
compile cache, marginal timing via chained fori_loop.
"""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

def sync(x):
    return float(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.float32 else x).block_until_ready()) if False else float(np.asarray(jnp.sum(x, dtype=jnp.float32) if x.dtype in (jnp.float32, jnp.uint8, jnp.int32) else jnp.sum(x)))

def timeit(fn, *args, iters=3):
    out = fn(*args); sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters

R = 20  # chained repetitions inside one jit to amortize dispatch

def gather_chain(table, idx):
    # idx [K, B]: K chained gathers of B rows each; fold output to keep a dep
    def step(acc, ix):
        rows = table[ix]  # [B, d]
        return acc + jnp.sum(rows, dtype=jnp.float32), None
    acc, _ = jax.lax.scan(step, jnp.float32(0), idx)
    return acc

gather_j = jax.jit(gather_chain)

def run_gather(n, d, dtype, b):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((n, d)).astype(np.float32))
    if dtype == "u8":
        table = (table * 255).astype(jnp.uint8)
    idx = jnp.asarray(rng.integers(0, n, (R, b)).astype(np.int32))
    t = timeit(gather_j, table, idx)
    rows = R * b
    print(f"gather N={n:>9} d={d:>4} {dtype:>3} B={b:>6}: "
          f"{t*1e3:8.2f} ms/chain  {rows/t/1e6:8.1f} Mrows/s  "
          f"{rows*(d*(1 if dtype=='u8' else 4))/t/1e9:7.1f} GB/s")

def mm_chain(q, tbl):
    def step(acc, _):
        p = jax.lax.dot_general(q, tbl, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return acc + jnp.sum(p, dtype=jnp.float32), None
    acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=5)
    return acc

mm_j = jax.jit(mm_chain)

def run_mm(b, n, d, dt):
    rng = np.random.default_rng(0)
    if dt == "int8":
        q = jnp.asarray(rng.integers(-127, 127, (b, d)).astype(np.int8))
        tbl = jnp.asarray(rng.integers(-127, 127, (n, d)).astype(np.int8))
        def f(q, tbl):
            def step(acc, _):
                p = jax.lax.dot_general(q, tbl, (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.int32)
                return acc + jnp.sum(p), None
            a, _ = jax.lax.scan(step, jnp.int32(0), None, length=5)
            return a
        t = timeit(jax.jit(f), q, tbl)
    else:
        q = jnp.asarray(rng.random((b, d)).astype(np.float32))
        tbl = jnp.asarray(rng.random((n, d)).astype(np.float32))
        if dt == "bf16":
            q, tbl = q.astype(jnp.bfloat16), tbl.astype(jnp.bfloat16)
        t = timeit(mm_j, q, tbl)
    fl = 5 * 2.0 * b * n * d
    print(f"matmul B={b:>5} N={n:>9} d={d:>4} {dt:>5}: {t*1e3:8.2f} ms/chain  {fl/t/1e12:6.1f} TF/s  -> {5*b/t:,.0f} q/s exact")

if __name__ == "__main__":
    print("== gather ==")
    for n in (100_000, 1_000_000):
        for d, dt in ((128, "f32"), (128, "u8"), (512, "f32")):
            for b in (16384, 524288):
                run_gather(n, d, dt, b)
    print("== matmul (flat search) ==")
    for dt in ("f32", "bf16", "int8"):
        run_mm(1024, 1_000_000, 128, dt)

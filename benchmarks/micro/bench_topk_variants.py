"""Microbench: flat-search top-k variants + packed-neighbor gather rate.

Informs (a) the fused flat path (VERDICT item 4) and (b) the packed
serving layout for beam search.
"""
import os, time
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))

def sync(*xs):
    return [float(np.asarray(jnp.sum(x, dtype=jnp.float32))) for x in xs]

def timeit(fn, *args, iters=3):
    out = fn(*args); sync(*jax.tree.leaves(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(*jax.tree.leaves(out))
    return (time.perf_counter() - t0) / iters

def affine_d2(q, codes, scales, normsq):
    mn, delta = scales[:, 0], scales[:, 1]
    qdotc = jnp.dot(q, codes.astype(jnp.float32).T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    qdotx = delta[None] * qdotc + mn[None] * jnp.sum(q, -1, keepdims=True)
    return jnp.maximum(jnp.sum(q*q, -1, keepdims=True) + normsq[None] - 2*qdotx, 0.0)

K = 10

def v_fullsort(q, codes, scales, normsq):
    d2 = affine_d2(q, codes, scales, normsq)
    ids = jnp.broadcast_to(jnp.arange(codes.shape[0], dtype=jnp.int32), d2.shape)
    sd, si = jax.lax.sort((d2, ids), dimension=-1, num_keys=2)
    return sd[:, :K], si[:, :K]

def v_topk(q, codes, scales, normsq):
    d2 = affine_d2(q, codes, scales, normsq)
    nv, ni = jax.lax.top_k(-d2, K)
    return -nv, ni.astype(jnp.int32)

def v_approx(q, codes, scales, normsq):
    d2 = affine_d2(q, codes, scales, normsq)
    nv, ni = jax.lax.approx_min_k(d2, K, recall_target=0.99)
    return nv, ni.astype(jnp.int32)

def v_tiled(q, codes, scales, normsq, T=131072):
    n = codes.shape[0]
    b = q.shape[0]
    nt = n // T
    qsq = jnp.sum(q*q, -1, keepdims=True)
    def step(carry, i):
        bd, bi = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i*T, T, 0)
        c, s, ns = sl(codes), sl(scales), sl(normsq)
        mn, delta = s[:, 0], s[:, 1]
        qdotc = jnp.dot(q, c.astype(jnp.float32).T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        qdotx = delta[None]*qdotc + mn[None]*jnp.sum(q, -1, keepdims=True)
        d2 = jnp.maximum(qsq + ns[None] - 2*qdotx, 0.0)
        nv, ni = jax.lax.top_k(-d2, K)
        ids = (i*T + ni).astype(jnp.int32)
        md = jnp.concatenate([bd, -nv], 1)
        mi = jnp.concatenate([bi, ids], 1)
        sd, si = jax.lax.sort((md, mi), dimension=-1, num_keys=2)
        return (sd[:, :K], si[:, :K]), None
    init = (jnp.full((b, K), jnp.inf), jnp.full((b, K), np.int32(2**31-1), jnp.int32))
    (bd, bi), _ = jax.lax.scan(step, init, jnp.arange(nt))
    return bd, bi

def run(name, fn, q, codes, scales, normsq, ref=None):
    f = jax.jit(fn)
    t = timeit(f, q, codes, scales, normsq)
    d, i = f(q, codes, scales, normsq)
    qps = q.shape[0] / t
    note = ""
    if ref is not None:
        rd, ri = ref
        match = float(jnp.mean((i == ri).astype(jnp.float32)))
        note = f" id-match={match:.4f}"
    print(f"{name:>10}: {t*1e3:8.2f} ms  {qps:10,.0f} QPS{note}", flush=True)
    return d, i

def packed_gather_bench(n, rowbytes, b, iters_chain=20):
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.integers(0, 255, (n, rowbytes), np.uint8))
    idx = jnp.asarray(rng.integers(0, n, (iters_chain, b)).astype(np.int32))
    def chain(tbl, idx):
        def step(acc, ix):
            return acc + jnp.sum(tbl[ix], dtype=jnp.float32), None
        a, _ = jax.lax.scan(step, jnp.float32(0), idx)
        return a
    t = timeit(jax.jit(chain), tbl, idx)
    per = t / iters_chain
    print(f"packed gather N={n} row={rowbytes}B B={b}: {per*1e6:8.1f} us/step "
          f"{b/per/1e6:6.1f} Mrows/s {b*rowbytes/per/1e9:6.1f} GB/s")

if __name__ == "__main__":
    rng = np.random.default_rng(0)
    N, D, B = 1_048_576, 128, 1024
    x = rng.random((N, D), np.float32)
    mn = x.min(1); mx = x.max(1)
    delta = (mx - mn) / 255
    codes = jnp.asarray(np.floor((x - mn[:, None]) / delta[:, None] + 0.5).astype(np.uint8))
    scales = jnp.asarray(np.stack([mn, delta], 1).astype(np.float32))
    xq = jnp.asarray(codes, jnp.float32) * scales[:, 1:2] + scales[:, 0:1]
    normsq = jnp.sum(xq*xq, -1)
    q = jnp.asarray(rng.random((B, D), np.float32))
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "tiled"
    print(f"== flat top-{K} at N={N} d={D} B={B} ==", flush=True)
    fns = {"fullsort": v_fullsort, "topk": v_topk, "approx": v_approx,
           "tiled": v_tiled}
    if which in fns:
        d_, i_ = run(which, fns[which], q, codes, scales, normsq)
        # exactness spot-check vs numpy on 16 queries
        import numpy as _np
        xs = _np.asarray(xq)
        for r in range(4):
            dd = _np.sum((xs - _np.asarray(q)[r][None, :])**2, axis=1)
            want = _np.argsort(dd, kind="stable")[:K]
            got = _np.asarray(i_[r])
            print(f"  q{r} exact-match: {sorted(got.tolist()) == sorted(want.tolist())}", flush=True)
        raise SystemExit

    print("== packed row gather (B rows of cap*(d+12) bytes) ==")
    for rowb in (2048, 4608):   # d=50 and d=128 packed rows, cap=32
        for b in (4096, 16384):
            packed_gather_bench(1_000_000, rowb, b)
    # beam-sort cost reference: [16k, 132] two-key sort in a chain
    bd = jnp.asarray(rng.random((16384, 132), np.float32))
    bi = jnp.asarray(rng.integers(0, 1<<30, (16384, 132)).astype(np.int32))
    def sort_chain(bd, bi):
        def step(c, _):
            d, i = c
            d2, i2 = jax.lax.sort((d, i), dimension=-1, num_keys=2)
            return (d2 + 1e-9, i2), None   # tiny perturbation keeps work live
        (d, i), _ = jax.lax.scan(step, (bd, bi), None, length=20)
        return d
    t = timeit(jax.jit(sort_chain), bd, bi)
    print(f"two-key sort [16384, 132] x20: {t/20*1e6:.0f} us/sort")

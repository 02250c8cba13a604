"""1M-scale build-throughput comparison: plain vs packed(lag=1) vs
packed(lag=8), with a recall spot-check per variant (quality gate for the
deferred-repack mode). Run on the real TPU. ~30-40 min cold."""
import os, sys, time, functools
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from hnsw_rs_tpu import HNSW
from hnsw_rs_tpu.utils.datasets import synthetic_clustered
from hnsw_rs_tpu.ops.quant import dequantize, quantize
from hnsw_rs_tpu.ops.distance import point_normsq
from hnsw_rs_tpu.models.flat import _flat_search_tiled
from hnsw_rs_tpu.models.hnsw import _ann_seeded_jit

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D, M, EFC, K = 96, 24, 128, 10
ds = synthetic_clustered(N, D, n_queries=256, seed=42)
truth = None

def check(index, label):
    global truth
    if truth is None:
        qq = dequantize(*quantize(jnp.asarray(ds.test)))
        normsq = point_normsq(index.points.codes, index.points.scales)
        _, ti = jax.jit(functools.partial(_flat_search_tiled, k=K))(
            qq, index.points.codes, index.points.scales, normsq)
        truth = [set(t) for t in np.asarray(ti)[:, :K]]
    index.finalize(pivots=8192)
    q = dequantize(*quantize(jnp.asarray(ds.test)))
    _, ann = _ann_seeded_jit(index._packed0, index._pivots[0], index._pivots[1], q, 48, K, 32, 1)
    rec = float(np.mean([len(set(a) & t)/K for a, t in zip(np.asarray(ann), truth)]))
    print(f"{label}: recall@10 (ef=48, mi=32) = {rec:.4f}", flush=True)

def build(label, **kw):
    t0 = time.time()
    idx = HNSW(M, ef_cons=EFC, dim=D)
    idx.insert_bulk(ds.train, **kw)
    for a in idx.graph.adjs:
        int(jnp.sum(jnp.abs(a) % 7))
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s = {N/dt:.0f} vec/s", flush=True)
    return idx

which = sys.argv[2] if len(sys.argv) > 2 else "all"
if which in ("all", "plain"):
    idx = build("plain        cold", packed_build=False)
    idx = build("plain        warm", packed_build=False)
    check(idx, "plain")
    del idx
if which in ("all", "lag8"):
    idx = build("packed lag=8 cold", pack_lag=8)
    idx = build("packed lag=8 warm", pack_lag=8)
    check(idx, "packed lag=8")
    del idx
if which in ("all", "lag1"):
    idx = build("packed lag=1 cold")
    idx = build("packed lag=1 warm")
    check(idx, "packed lag=1")

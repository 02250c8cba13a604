"""1M build with a tighter construction-search iteration cap: the beam
loop runs to max_iters (bench_search_iters), so the cap is a direct
speed-vs-quality knob. Measures build rate + recall at mi=efc+32 vs the
default 2*efc+16. Run on the real TPU."""
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
MI = int(sys.argv[2]) if len(sys.argv) > 2 else 160
SEEDED = len(sys.argv) > 3 and sys.argv[3] == "seeded"
EFC_ARG = int(sys.argv[4]) if len(sys.argv) > 4 else 128
D, M, K = 96, 24, 10
EFC = EFC_ARG
ds = synthetic_clustered(N, D, n_queries=256, seed=42)

def build(label, **kw):
    t0 = time.time()
    idx = HNSW(M, ef_cons=EFC, dim=D)
    idx.insert_bulk(ds.train, verbose=True, **kw)
    for a in idx.graph.adjs:
        int(jnp.sum(jnp.abs(a) % 7))
    dt = time.time() - t0
    print(f"{label}: {dt:.1f}s = {N/dt:.0f} vec/s", flush=True)
    return idx

tag = f"mi={MI}" + (" seeded" if SEEDED else "")
idx = build(f"{tag} cold", max_iters=MI, packed_build=False, build_seeded=SEEDED)
idx = build(f"{tag} warm", max_iters=MI, packed_build=False, build_seeded=SEEDED)

qq = dequantize(*quantize(jnp.asarray(ds.test)))
normsq = point_normsq(idx.points.codes, idx.points.scales)
_, ti = jax.jit(functools.partial(_flat_search_tiled, k=K))(
    qq, idx.points.codes, idx.points.scales, normsq)
truth = [set(t) for t in np.asarray(ti)[:, :K]]
idx.finalize(pivots=8192)
for ef, mi_q in ((40, 24), (48, 32)):
    _, ann = _ann_seeded_jit(idx._packed0, idx._pivots[0], idx._pivots[1], qq, ef, K, mi_q, 1)
    rec = float(np.mean([len(set(a) & t)/K for a, t in zip(np.asarray(ann), truth)]))
    print(f"recall@10 ef={ef} mi={mi_q}: {rec:.4f}", flush=True)

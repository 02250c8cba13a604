"""One cluster build at N, then a WIDE (ef, max_iters) recall ladder —
separates graph quality (asymptote) from iteration budget (curve shape).

    python benchmarks/micro/bench_cluster_recall.py [--n 1000000]
"""
import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
from hnsw_rs_tpu import HNSW  # noqa: E402
from hnsw_rs_tpu.models.flat import _flat_search_tiled  # noqa: E402
from hnsw_rs_tpu.models.hnsw import _ann_seeded_jit  # noqa: E402
from hnsw_rs_tpu.ops.distance import point_normsq  # noqa: E402
from hnsw_rs_tpu.ops.quant import dequantize, quantize  # noqa: E402
from hnsw_rs_tpu.utils.datasets import synthetic_clustered  # noqa: E402

p = argparse.ArgumentParser()
p.add_argument("--n", type=int, default=1_000_000)
p.add_argument("--m", type=int, default=24)
p.add_argument("--efc", type=int, default=128)
p.add_argument("--pool-p", type=int, default=256)
p.add_argument("--fanout", type=int, default=12)
p.add_argument("--ppc", type=int, default=256)
p.add_argument("--pivots", type=int, default=8192)
a = p.parse_args()

D, K = 96, 10
ds = synthetic_clustered(a.n, D, n_queries=256, seed=42)
t0 = time.time()
idx = HNSW(a.m, ef_cons=a.efc, dim=D)
idx.insert_bulk(
    ds.train, cluster_build=True,
    cluster_kwargs={"pool_p": a.pool_p, "fanout": a.fanout,
                    "points_per_cluster": a.ppc},
)
for adj in idx.graph.adjs:
    int(jnp.sum(jnp.abs(adj) % 7))
print(f"build: {time.time()-t0:.1f}s", flush=True)

qq = dequantize(*quantize(jnp.asarray(ds.test)))
normsq = point_normsq(idx.points.codes, idx.points.scales)
_, ti = jax.jit(functools.partial(_flat_search_tiled, k=K))(
    qq, idx.points.codes, idx.points.scales, normsq
)
truth = [set(t) for t in np.asarray(ti)[:, :K]]
idx.finalize(pivots=a.pivots)
print(f"pivots used: {int(idx._pivots[0].shape[0])}", flush=True)
for ef, mi in ((40, 24), (64, 56), (96, 120), (128, 280), (192, 400),
               (256, 528)):
    _, ann = _ann_seeded_jit(
        idx._packed0, idx._pivots[0], idx._pivots[1], qq, ef, K, mi, 1
    )
    rec = float(np.mean(
        [len(set(x) & t) / K for x, t in zip(np.asarray(ann), truth)]
    ))
    print(f"recall@10 ef={ef} mi={mi}: {rec:.4f}", flush=True)

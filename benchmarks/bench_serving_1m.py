"""Serving frontier at million scale: sweep (ef, expand_e) on the cached
bench.py index and report the recall/QPS frontier on the real TPU.

``expand_e`` pops E beam entries per lockstep iteration (superset
discovery — recall per ef is the same or better, ~E× fewer iterations;
see search._beam_loop). This script finds the fastest config clearing
recall@10 >= 0.99, which bench.py then serves as the headline.

Run: python benchmarks/bench_serving_1m.py  (after one bench.py run has
populated .bench_cache). Writes SERVING_1M.json next to this file.
"""

import functools
import json
import os
import sys
import time

from common import setup_jax

jax = setup_jax(cpu="--cpu" in sys.argv)

import jax.numpy as jnp
import numpy as np

from hnsw_rs_tpu import HNSW
from hnsw_rs_tpu.models.hnsw import _ann_packed_jit
from hnsw_rs_tpu.ops.quant import dequantize, quantize
from hnsw_rs_tpu.utils.datasets import synthetic_clustered

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N, D, K, NQ = 1_000_000, 96, 10, 1024
TAG = f"n{N}_d{D}_m16_efc96"
IDX = os.path.join(ROOT, ".bench_cache", f"idx_{TAG}")
GT = os.path.join(ROOT, ".bench_cache", f"gt_{TAG}.npz")
assert os.path.isdir(IDX), "run bench.py once to populate the cache"

ds = synthetic_clustered(N, D, n_queries=NQ, seed=42)
index = HNSW.load(IDX)
index.finalize()
truth = [set(t) for t in np.load(GT)["ids"][:, :K]]

codes, scales = index.points.codes, index.points.scales
packed0 = index._packed0
adjs_upper = tuple(index.graph.adjs[1:])
ep = jnp.asarray(index.params.ep, jnp.int32)


@functools.partial(jax.jit, static_argnames=("ef", "k", "mi", "e"))
def search_sum(adjs_upper, packed0, codes, scales, q, ep, ef, k, mi, e):
    d, i = _ann_packed_jit(
        adjs_upper, packed0, codes, scales, q, ep, ef, k, mi, e
    )
    return jnp.sum(i) + jnp.sum(d).astype(jnp.int32)


batch = 16384
big = np.tile(ds.test, (-(-batch // NQ), 1))[:batch]
qbig = dequantize(*quantize(jnp.asarray(big)))
q1k = dequantize(*quantize(jnp.asarray(ds.test)))

rows = []
for expand in (1, 2, 4, 8):
    for ef in (48, 64, 96, 128, 192):
        mi = -(-(2 * ef + 16) // expand) + 8
        _, ann = _ann_packed_jit(
            adjs_upper, packed0, codes, scales, q1k, ep, ef, K, mi, expand
        )
        ann = np.asarray(ann)
        rec = float(np.mean([len(set(a) & t) / K for a, t in zip(ann, truth)]))
        args = (adjs_upper, packed0, codes, scales, qbig, ep, ef, K, mi, expand)
        int(search_sum(*args))  # compile + warm
        t0 = time.time()
        iters = 0
        while time.time() - t0 < 4.0 or iters < 3:
            int(search_sum(*args))
            iters += 1
        qps = batch * iters / (time.time() - t0)
        rows.append(
            {"expand": expand, "ef": ef, "max_iters": mi,
             "recall": round(rec, 4), "qps": round(qps, 1)}
        )
        print(rows[-1], flush=True)

ok = [r for r in rows if r["recall"] >= 0.99]
best = max(ok, key=lambda r: r["qps"]) if ok else None
out = {"n": N, "d": D, "rows": rows, "best_at_0.99": best}
path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SERVING_1M.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print("best @0.99:", best, flush=True)
print("wrote", path, flush=True)

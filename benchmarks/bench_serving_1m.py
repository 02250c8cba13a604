"""Serving frontier at million scale: recall/QPS across the three
serving modes on the cached bench.py index, on the real TPU.

Modes (see DEVNOTES "Serving-path findings"):
- packed:   upper-layer greedy descent + packed layer-0 beam
  (``search.ann_search_packed``), exact reference traversal semantics;
- expand:   same with E>1 beam pops per iteration;
- seeded:   pivot-seeded — one MXU matmul against the upper-layer
  skeleton seeds the beam, replacing the descent
  (``search.ann_search_seeded``); max_iters becomes the main knob.

The QPS ceiling is the row-gather issue floor (~60-100 ns/row) times
beam iterations, so the frontier is essentially iterations-vs-recall.

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
from hnsw_rs_tpu.models.hnsw import _ann_packed_jit, _ann_seeded_jit
from hnsw_rs_tpu.ops.quant import dequantize, quantize
from hnsw_rs_tpu.utils.datasets import synthetic_clustered

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N, D, K, NQ, M, EFC = 1_000_000, 96, 10, 1024, 24, 128
IDX = os.path.join(ROOT, ".bench_cache", f"idx_n{N}_d{D}_m{M}_efc{EFC}")
GT = os.path.join(ROOT, ".bench_cache", f"gt_n{N}_d{D}.npz")
assert os.path.isdir(IDX), "run bench.py once to populate the cache"

ds = synthetic_clustered(N, D, n_queries=NQ, seed=42)
index = HNSW.load(IDX)
index.finalize(pivots=8192)
truth = [set(t) for t in np.load(GT)["ids"][:, :K]]

codes, scales = index.points.codes, index.points.scales
packed0 = index._packed0
pivot_ids, pivot_vecs = index._pivots
adjs_upper = tuple(index.graph.adjs[1:])
ep = jnp.asarray(index.params.ep, jnp.int32)
q1k = dequantize(*quantize(jnp.asarray(ds.test)))

batch = 32768
big = np.tile(ds.test, (-(-batch // NQ), 1))[:batch]
qbig = dequantize(*quantize(jnp.asarray(big)))


@functools.partial(jax.jit, static_argnames=("ef", "k", "mi", "e"))
def packed_sum(adjs_upper, packed0, codes, scales, q, ep, ef, k, mi, e):
    d, i = _ann_packed_jit(adjs_upper, packed0, codes, scales, q, ep, ef, k, mi, e)
    return jnp.sum(i) + jnp.sum(d).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("ef", "k", "mi"))
def seeded_sum(packed0, pivot_ids, pivot_vecs, q, ef, k, mi):
    d, i = _ann_seeded_jit(packed0, pivot_ids, pivot_vecs, q, ef, k, mi)
    return jnp.sum(i) + jnp.sum(d).astype(jnp.int32)


def qps_of(fn, *args):
    int(fn(*args))
    t0 = time.time()
    it = 0
    while time.time() - t0 < 4.0 or it < 3:
        int(fn(*args))
        it += 1
    return batch * it / (time.time() - t0)


rows = []
for mode, ef, mi, e in [
    ("packed", 48, 112, 1), ("packed", 96, 208, 1), ("packed", 128, 280, 1),
    ("expand", 96, 112, 2), ("expand", 128, 148, 2),
    ("seeded", 40, 24, 1), ("seeded", 48, 24, 1), ("seeded", 48, 32, 1),
    ("seeded", 48, 48, 1), ("seeded", 64, 56, 1), ("seeded", 96, 96, 1),
]:
    if mode == "seeded":
        _, ann = _ann_seeded_jit(packed0, pivot_ids, pivot_vecs, q1k, ef, K, mi)
        qps = qps_of(seeded_sum, packed0, pivot_ids, pivot_vecs, qbig, ef, K, mi)
    else:
        _, ann = _ann_packed_jit(
            adjs_upper, packed0, codes, scales, q1k, ep, ef, K, mi, e
        )
        qps = qps_of(
            packed_sum, adjs_upper, packed0, codes, scales, qbig, ep, ef, K, mi, e
        )
    rec = float(np.mean([len(set(a) & t) / K for a, t in zip(np.asarray(ann), truth)]))
    rows.append(
        {"mode": mode, "ef": ef, "max_iters": mi, "expand": e,
         "recall": round(rec, 4), "qps": round(qps, 1)}
    )
    print(rows[-1], flush=True)

ok = [r for r in rows if r["recall"] >= 0.99]
best = max(ok, key=lambda r: r["qps"]) if ok else None
out = {"n": N, "d": D, "m": M, "ef_cons": EFC, "rows": rows, "best_at_0.99": best}
path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SERVING_1M.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print("best @0.99:", best, flush=True)
print("wrote", path, flush=True)

"""Second committed 1M serving regime (round-3 hardening): the headline
QPS@recall>=0.99 measured on synthetic-HEAVY-TAILED data (Zipf cluster
sizes, per-cluster scale spread, 20% tail queries) so the number is not
single-distribution. Same config as bench.py (M=24, efc=128, pivot-seeded
serving). Writes benchmarks/SERVING_REGIMES.json.

Run on the real TPU: python benchmarks/bench_second_regime.py [--quick]
"""

import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.models.flat import _flat_search_tiled
    from hnsw_rs_tpu.models.hnsw import _ann_seeded_jit
    from hnsw_rs_tpu.ops.distance import point_normsq
    from hnsw_rs_tpu.ops.quant import dequantize, quantize
    from hnsw_rs_tpu.utils.datasets import synthetic_heavy_tailed

    N = 100_000 if "--quick" in sys.argv else int(os.environ.get("HNSW_BENCH_N", "1000000"))
    # PIVOTS=32768 with pivot_cover=0.5: the measured coverage point for
    # this regime's ~16k natural blobs — k-center fill must reach every
    # blob (diag_heavy_tailed.py: whole-query misses 110 -> 0, failure
    # seed/trueNN ratio 3.06 -> 1.06). Pivot memory is still tiny
    # (32k * 96 * 4 B = 12.6 MB vs the ~5 GB packed table).
    D, K, M, EF_CONS, NQ, PIVOTS = 96, 10, 24, 128, 1024, 32768
    COVER = 0.5
    cache = os.path.join(ROOT, ".bench_cache")
    tag = f"ht_n{N}_d{D}_m{M}_efc{EF_CONS}"
    idx_dir = os.path.join(cache, f"idx_{tag}")
    gt_path = os.path.join(cache, f"gt_{tag}.npz")
    os.makedirs(cache, exist_ok=True)

    ds = synthetic_heavy_tailed(N, D, n_queries=NQ, seed=42)

    if os.path.isdir(idx_dir):
        index = HNSW.load(idx_dir)
        build_rate = None
    else:
        t0 = time.time()
        index = HNSW(M, ef_cons=EF_CONS, dim=D)
        index.insert_bulk(ds.train, cluster_build=True,
                          cluster_kwargs={"pool_p": 256,
                                          "points_per_cluster": 96})
        for a in index.graph.adjs:
            int(jnp.sum(jnp.abs(a) % 7))
        build_rate = N / (time.time() - t0)
        index.save(idx_dir)

    if os.path.exists(gt_path):
        truth = np.load(gt_path)["ids"]
    else:
        qq = dequantize(*quantize(jnp.asarray(ds.test)))
        normsq = point_normsq(index.points.codes, index.points.scales)
        _, ti = jax.jit(functools.partial(_flat_search_tiled, k=K))(
            qq, index.points.codes, index.points.scales, normsq
        )
        truth = np.asarray(ti)[:, :K]
        np.savez_compressed(gt_path, ids=truth)
    truth_sets = [set(t) for t in truth]

    index.finalize(pivots=PIVOTS, pivot_cover=COVER)
    packed0 = index._packed0
    pivot_ids, pivot_vecs = index._pivots
    q1k = dequantize(*quantize(jnp.asarray(ds.test)))

    cands = [(40, 24), (48, 28), (48, 32), (64, 40), (64, 56), (96, 80),
             (128, 112), (192, 200), (256, 280), (384, 500), (512, 700),
             (768, 1100)]
    chosen = None
    for ef, mi in cands:
        _, ann = _ann_seeded_jit(packed0, pivot_ids, pivot_vecs, q1k, ef, K, mi, 1)
        rec = float(np.mean([
            len(set(a) & t) / K for a, t in zip(np.asarray(ann), truth_sets)
        ]))
        print(f"ef={ef} mi={mi} recall={rec:.4f}", flush=True)
        if rec >= 0.99:
            chosen = (ef, mi, rec)
            break
    gate_met = chosen is not None
    if not gate_met:
        chosen = (ef, mi, rec)
    ef, mi, rec = chosen

    @functools.partial(jax.jit, static_argnames=("ef", "k", "mi"))
    def search_sum(packed0, pivot_ids, pivot_vecs, q, ef, k, mi):
        d, i = _ann_seeded_jit(packed0, pivot_ids, pivot_vecs, q, ef, k, mi)
        return jnp.sum(i) + jnp.sum(d).astype(jnp.int32)

    batch = 32768
    big = np.tile(ds.test, (-(-batch // NQ), 1))[:batch]
    q = dequantize(*quantize(jnp.asarray(big)))
    int(search_sum(packed0, pivot_ids, pivot_vecs, q, ef, K, mi))
    t0 = time.time()
    iters = 0
    while time.time() - t0 < 5.0 or iters < 3:
        int(search_sum(packed0, pivot_ids, pivot_vecs, q, ef, K, mi))
        iters += 1
    qps = batch * iters / (time.time() - t0)

    out_path = os.path.join(ROOT, "benchmarks", "SERVING_REGIMES.json")
    rows = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            rows = json.load(f).get("rows", [])
    if build_rate is None:  # cached index: keep the measured build rate
        prev = [r for r in rows if r.get("regime") == "heavy-tailed"]
        build_rate = prev[-1].get("build_vps") if prev else None
    rows = [r for r in rows if r.get("regime") != "heavy-tailed"] + [{
        "regime": "heavy-tailed",
        "n": N, "d": D, "m": M, "ef_cons": EF_CONS,
        "mode": "packed+pivots", "pivots": int(pivot_ids.shape[0]),
        "ef": ef, "max_iters": mi,
        "recall": round(rec, 4), "gate_met": gate_met,
        "qps": round(qps, 1),
        "build_vps": round(build_rate, 1) if build_rate else None,
    }]
    with open(out_path, "w") as f:
        json.dump({"rows": rows}, f, indent=2)
    print(json.dumps(rows[-1]))


if __name__ == "__main__":
    main()

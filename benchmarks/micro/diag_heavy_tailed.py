"""Diagnose the heavy-tailed 1M serving-recall asymptote (0.9427 at
ef=384 in SERVING_REGIMES.json): graph reachability vs seed coverage.

Loads the cached index built by bench_second_regime.py. Reports:
- recall ladder for seeded serving at increasing (ef, mi)
- per-query failure anatomy: whole-query failures, best-seed distance
  ratio vs true NN for the worst queries
- layer-0 in-degree-0 count (unreachable rows) and BFS reachable
  fraction from the pivot set (host, adjacency fetched once)

Run on the real TPU: python benchmarks/micro/diag_heavy_tailed.py
"""

import functools
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.models.hnsw import _ann_seeded_jit
    from hnsw_rs_tpu.ops.quant import dequantize, quantize
    from hnsw_rs_tpu.utils.datasets import synthetic_heavy_tailed

    N, D, K, M, EF_CONS, NQ = 1_000_000, 96, 10, 24, 128, 1024
    PIVOTS = int(os.environ.get("DIAG_PIVOTS", "16384"))
    COVER = float(os.environ.get("DIAG_COVER", "0.25"))
    cache = os.path.join(ROOT, ".bench_cache")
    tag = f"ht_n{N}_d{D}_m{M}_efc{EF_CONS}"
    idx_dir = os.path.join(cache, f"idx_{tag}")
    gt_path = os.path.join(cache, f"gt_{tag}.npz")
    assert os.path.isdir(idx_dir) and os.path.exists(gt_path), "run bench_second_regime first"

    ds = synthetic_heavy_tailed(N, D, n_queries=NQ, seed=42)
    index = HNSW.load(idx_dir)
    truth = np.load(gt_path)["ids"]
    truth_sets = [set(t) for t in truth]

    index.finalize(pivots=PIVOTS, pivot_cover=COVER)
    packed0 = index._packed0
    pivot_ids, pivot_vecs = index._pivots
    print(f"pivots: {pivot_ids.shape[0]} cover={COVER} "
          f"(cluster reps: {0 if index._cluster_pivots is None else len(index._cluster_pivots)})",
          flush=True)
    q1k = dequantize(*quantize(jnp.asarray(ds.test)))

    # 1. recall ladder
    per_q = None
    for ef, mi in [(64, 40), (128, 112), (256, 280), (512, 700)]:
        _, ann = _ann_seeded_jit(packed0, pivot_ids, pivot_vecs, q1k, ef, K, mi, 1)
        ann = np.asarray(ann)
        rq = np.array([len(set(a) & t) / K for a, t in zip(ann, truth_sets)])
        print(f"seeded ef={ef} mi={mi}: recall={rq.mean():.4f} "
              f"whole-miss={(rq == 0).sum()} half-miss={(rq <= 0.5).sum()}",
              flush=True)
        per_q = rq

    # 2. failure anatomy at the asymptote
    bad = np.flatnonzero(per_q <= 0.5)
    print(f"failing queries (<=0.5 recall at ef=512): {bad.size}", flush=True)
    if bad.size:
        qb = np.asarray(q1k)[bad]
        pv = np.asarray(pivot_vecs)
        # best seed distance vs true NN distance (f32 host)
        seed_d = np.sqrt(((qb[:, None, :16] - pv[None, :, :16]) ** 2).sum(-1))  # crude probe on 16 dims
        from hnsw_rs_tpu.ops.quant import dequantize as dq
        tnn = truth[bad, 0]
        tv = np.asarray(dq(index.points.codes[tnn], index.points.scales[tnn]))
        d_true = np.sqrt(((qb - tv) ** 2).sum(-1))
        # full-dim best seed
        best_seed = np.full(bad.size, np.inf, np.float32)
        for lo in range(0, pv.shape[0], 4096):
            chunk = pv[lo : lo + 4096]
            d = np.sqrt(((qb[:, None, :] - chunk[None]) ** 2).sum(-1)).min(1)
            best_seed = np.minimum(best_seed, d)
        ratio = best_seed / np.maximum(d_true, 1e-9)
        print("seed/trueNN distance ratio for failures: "
              f"median={np.median(ratio):.2f} max={ratio.max():.2f} "
              f"(<=2 means seeds are fine, graph is the problem)", flush=True)

    # 3. reachability: BFS from pivot ids over layer-0 adjacency (host)
    adj0 = np.asarray(index.graph.get_layer(0)[:N])
    indeg0 = np.bincount(adj0[adj0 >= 0], minlength=N)
    print(f"layer0: indeg0-zero rows={int((indeg0 == 0).sum())} "
          f"empty rows={int((adj0 < 0).all(1).sum())}", flush=True)
    frontier = np.unique(np.asarray(pivot_ids))
    seen = np.zeros(N, bool)
    seen[frontier] = True
    rounds = 0
    while frontier.size and rounds < 60:
        nxt = adj0[frontier]
        nxt = np.unique(nxt[nxt >= 0])
        nxt = nxt[~seen[nxt]]
        seen[nxt] = True
        frontier = nxt
        rounds += 1
    print(f"BFS from {pivot_ids.shape[0]} pivots: reachable="
          f"{seen.mean():.4f} after {rounds} rounds", flush=True)
    # how many of the MISSED true neighbors are unreachable?
    if bad.size:
        missed = [t for b in bad for t in truth[b]]
        missed = np.asarray(sorted(set(missed)))
        print(f"missed-true-neighbor rows unreachable: "
              f"{int((~seen[missed]).sum())}/{missed.size}", flush=True)


if __name__ == "__main__":
    main()

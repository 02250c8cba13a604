"""Serving memory/QPS frontier at N=1M (BASELINE's "equal index memory"
condition): for each serving mode, device bytes per point actually held,
the cheapest (ef, max_iters) clearing recall@10 >= 0.99, and measured QPS.

Modes:
  raw        — codes+scales (u8) table, plain hierarchical traversal
  f32        — + dequantized f32 table cache (the round-1 default)
  seed-plain — pivot seeds + PLAIN layer-0 gathers (finalize(packed=False)):
               the memory-honest mode, ~2-3x raw index memory
  packed     — packed layer-0 rows, hierarchical descent
  packed+piv — packed rows + pivot seeds (the headline mode)
  pq+piv     — PQ-packed rows + ADC beam + exact rerank
               (finalize(pq_m=24, ...)): the beyond-HBM memory mode

Writes benchmarks/SERVING_MEMORY.json. Reuses bench.py's .bench_cache
index. Run on the real TPU: python benchmarks/bench_serving_memory.py
[--quick] (quick = N=100k).
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
    from hnsw_rs_tpu.models.hnsw import (
        _ann_jit,
        _ann_packed_jit,
        _ann_pq_jit,
        _ann_seeded_jit,
        _ann_seeded_plain_jit,
    )
    from hnsw_rs_tpu.ops.distance import point_normsq
    from hnsw_rs_tpu.ops.quant import dequantize, quantize
    from hnsw_rs_tpu.utils.datasets import synthetic_clustered

    N = 100_000 if "--quick" in sys.argv else int(os.environ.get("HNSW_BENCH_N", "1000000"))
    D, K, M, EF_CONS, NQ, PIVOTS = 96, 10, 24, 128, 1024, 16384
    cache = os.path.join(ROOT, ".bench_cache")
    tag = f"n{N}_d{D}_m{M}_efc{EF_CONS}"
    idx_dir = os.path.join(cache, f"idx_{tag}")
    gt_path = os.path.join(cache, f"gt_n{N}_d{D}.npz")
    os.makedirs(cache, exist_ok=True)

    ds = synthetic_clustered(N, D, n_queries=NQ, seed=42)
    if os.path.isdir(idx_dir):
        index = HNSW.load(idx_dir)
    else:
        index = HNSW(M, ef_cons=EF_CONS, dim=D)
        # the bench.py headline build config (shared .bench_cache index)
        index.insert_bulk(ds.train, cluster_build=True,
                          cluster_kwargs={"pool_p": 96,
                                          "points_per_cluster": 96,
                                          "fanout": 5,
                                          "select_alg4": False})
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
    q1k = dequantize(*quantize(jnp.asarray(ds.test)))

    # shared layout sizes (bytes)
    cap0 = index.graph.get_layer(0).shape[1]
    b_codes = N * D + N * 8
    b_adj = sum(N * a.shape[1] * 4 for a in index.graph.adjs)
    b_f32 = N * D * 4
    b_packed = N * cap0 * (D + 12)
    raw_base = b_codes + b_adj  # "raw index memory" denominator

    pq_only = "--pq-only" in sys.argv
    codes, scales = index.points.codes, index.points.scales
    ep = jnp.asarray(index.params.ep, jnp.int32)
    if not pq_only:
        index.finalize(pivots=PIVOTS)
        packed0 = index._packed0
        pivot_ids, pivot_vecs = index._pivots
        adjs = tuple(index.graph.adjs)
        adj0 = index.graph.get_layer(0)
        f32 = dequantize(codes, scales)
        b_piv = int(pivot_ids.size * 4 + pivot_vecs.size * 4)

    batch = 32768
    big = np.tile(ds.test, (-(-batch // NQ), 1))[:batch]
    qbig = dequantize(*quantize(jnp.asarray(big)))

    out_path = os.path.join(ROOT, "benchmarks", "SERVING_MEMORY.json")

    def write_out(rows):
        out = {
            "n": N, "d": D, "m": M, "ef_cons": EF_CONS, "k": K,
            "pivots": PIVOTS,
            "raw_index_bytes_per_point": round(raw_base / N, 1),
            "batch": batch,
            "rows": rows,
        }
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {out_path} ({len(rows)} rows)")

    def measure(name, fn, arrs, bytes_total, cands, qb=None):
        # fn(arrs, q, ef, mi) -> (d, ids); arrs is a tuple of device
        # arrays passed as jit ARGUMENTS (closure capture bakes them into
        # the HLO as constants and the dev tunnel's remote compiler
        # rejects multi-GB request bodies — DEVNOTES HTTP 413)
        chosen = None
        for ef, mi in cands:
            _, ann = fn(arrs, q1k, ef, mi)
            rec = float(np.mean([
                len(set(a) & t) / K for a, t in zip(np.asarray(ann), truth_sets)
            ]))
            if rec >= 0.99:
                chosen = (ef, mi, rec)
                break
        if chosen is None:
            chosen = (ef, mi, rec)
        ef, mi, rec = chosen

        @functools.partial(jax.jit, static_argnames=("ef", "mi"))
        def search_sum(arrs, q, ef, mi):
            d, i = fn(arrs, q, ef, mi)
            return jnp.sum(i) + jnp.sum(d).astype(jnp.int32)

        qb = qbig if qb is None else qb
        int(search_sum(arrs, qb, ef, mi))
        t0 = time.time()
        iters = 0
        while time.time() - t0 < 4.0 or iters < 3:
            int(search_sum(arrs, qb, ef, mi))
            iters += 1
        qps = qb.shape[0] * iters / (time.time() - t0)
        row = {
            "mode": name,
            "bytes_per_point": round(bytes_total / N, 1),
            "x_raw_memory": round(bytes_total / raw_base, 2),
            "qps": round(qps, 1),
            "recall": round(rec, 4),
            "gate_met": rec >= 0.99,
            "ef": ef,
            "max_iters": mi,
        }
        print(json.dumps(row), flush=True)
        return row

    hier_cands = [(64, 80), (96, 120), (128, 160), (128, 280), (192, 420),
                  (256, 560)]
    seed_cands = [(16, 8), (24, 10), (24, 12), (32, 16), (40, 20), (40, 24),
                  (48, 28), (48, 32), (64, 40), (64, 56), (96, 80),
                  (128, 112), (192, 200)]

    if pq_only and os.path.exists(out_path):
        with open(out_path) as f:
            rows = [r for r in json.load(f)["rows"] if not
                    r["mode"].startswith("pq")]
    elif pq_only:
        rows = []
    if not pq_only:
        rows = [
        measure(
            "raw",
            lambda a, q, ef, mi: _ann_jit(a[0], a[1], a[2], q, a[3], ef, K, mi),
            (adjs, codes, scales, ep),
            b_codes + b_adj,
            hier_cands,
        ),
        measure(
            "f32",
            lambda a, q, ef, mi: _ann_jit(a[0], a[1], a[2], q, a[3], ef, K, mi),
            (adjs, f32, scales, ep),
            b_codes + b_adj + b_f32,
            hier_cands,
        ),
        measure(
            "seed-plain",
            lambda a, q, ef, mi: _ann_seeded_plain_jit(
                a[0], a[1], a[2], a[3], a[4], q, ef, K, mi
            ),
            (adj0, f32, scales, pivot_ids, pivot_vecs),
            b_codes + b_adj + b_f32 + b_piv,
            seed_cands,
        ),
        measure(
            "packed",
            lambda a, q, ef, mi: _ann_packed_jit(
                a[0], a[1], a[2], a[3], q, a[4], ef, K, mi
            ),
            (adjs[1:], packed0, codes, scales, ep),
            b_codes + b_adj + b_packed,
            hier_cands,
        ),
        measure(
            "packed+piv",
            lambda a, q, ef, mi: _ann_seeded_jit(
                a[0], a[1], a[2], q, ef, K, mi
            ),
            (packed0, pivot_ids, pivot_vecs),
            b_codes + b_adj + b_packed + b_piv,
            seed_cands,
        ),
        ]
        write_out(rows)  # crash-safe: the PQ mode below has OOM-killed
        # the TPU worker at 1M (silent-OOM class, DEVNOTES "usable HBM")

    # PQ-coded mode replaces the exact pack — free it first (both packs
    # cannot be HBM-resident at 1M: 5.2 GB + 1.7 GB + base tables > HBM).
    # Also drop the f32 table + adjacency aliases the earlier modes held.
    # Even so, the 32k-query timing batch OOM-killed the TPU worker at 1M
    # in the same process as the base modes (silent-OOM class, DEVNOTES
    # "usable HBM") — run `--pq-only` in a FRESH process, which also
    # shrinks the timing batch to 8k queries.
    if not pq_only:
        # do NOT roll into the PQ modes in this process: freeing the
        # base-mode tables is not enough — the 1M PQ timing batch
        # OOM-killed the TPU worker in-process in round 3 (silent-OOM
        # class, DEVNOTES "usable HBM"). PQ rows are measured by a
        # FRESH `--pq-only` process.
        print("base rows written; run `bench_serving_memory.py --pq-only` "
              "in a fresh process for the PQ rows")
        return
    # (pq_m, pq_bits): 8-bit rows are the round-3 gather-ADC points;
    # the 4-bit rows keep the same bytes/point but score via the
    # gather-free LUT16 compare-select ADC (ops.pq.adc_score16) — the
    # round-4 throughput fix for the 553-QPS LUT-gather wall
    for pq_m, pq_bits in ((24, 8), (48, 8), (24, 4), (48, 4)):
        index.finalize(pivots=PIVOTS, pq_m=pq_m, pq_bits=pq_bits)
        cb, pq_codes, packed_pq, _rot = index._pq
        pivot_ids, pivot_vecs = index._pivots
        b_piv = int(pivot_ids.size * 4 + pivot_vecs.size * 4)
        b_pq = int(packed_pq.size + pq_codes.size + cb.size * 4)
        rows.append(
            measure(
                f"pq{pq_m}" + ("x4b" if pq_bits == 4 else "") + "+piv",
                # rerank = full beam (the library default since the ADC
                # anatomy finding: ADC ordering inside a neighborhood is
                # near-random at these code rates, the exact rescore is
                # one [B, ef] gather — see HNSW.ann_batch)
                lambda a, q, ef, mi: _ann_pq_jit(
                    a[0], a[1], a[2], a[3], a[4], a[5], a[6], q, ef, K, mi,
                    max(4 * K, ef),
                ),
                (packed_pq, cb, pq_codes, pivot_ids, pivot_vecs, codes,
                 scales),
                b_codes + b_adj + b_pq + b_piv,
                seed_cands + [(256, 280)],
                qb=qbig[:8192] if pq_only else None,
            )
        )
        del cb, pq_codes, packed_pq, pivot_ids, pivot_vecs
        index._pq = None
        write_out(rows)


if __name__ == "__main__":
    main()

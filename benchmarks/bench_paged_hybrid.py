"""Out-of-core serving QPS: host-side PagedHNSW vs the device hot-tier
HybridPagedHNSW, with the hot tier capped at a fraction of the packed
index (the artificial "HBM cap": the index's packed rows are ~2x the
budget). Reports recall parity vs the in-memory packed index, hot-tier
hit rate, and QPS for both paged modes. Writes
benchmarks/PAGED_HYBRID.json.

Run on the real TPU (the dev tunnel's ~33 ms/dispatch floor and ~5 MB/s
host->device staging bound the hybrid number here — the json records
dispatches/query so the non-tunnel projection is explicit):
    python benchmarks/bench_paged_hybrid.py [--quick]

``--big`` (round 5) runs the BEYOND-HBM ladder the out-of-core mode
exists for: N=2M at M=24/d=96, whose exact packed serving rows
(cap*(d+12) = 5184 B/point = 10.4 GB) exceed usable HBM (~7-8 GB,
DEVNOTES) — the in-memory packed mode CANNOT serve this index. The
in-HBM reference both paged modes are paired against is the
memory-honest seeded-plain mode (pivot seeds + plain layer-0 gathers,
~1.2 GB: the strongest serving an honest single chip can hold at this
N). Writes a "beyond_hbm" section into PAGED_HYBRID.json alongside the
200k contract rows.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


_BIG_NOTE = (
    "exact packed rows = 10.4 GB > ~7-8 GB usable HBM (DEVNOTES); in-HBM reference is the memory-honest seeded-plain mode. CAVEATS: 256-query batches through the dev tunnel \u2014 fixed dispatch/IO floors dominate every absolute QPS here; host-paged uses the reference-faithful hierarchical-descent entry, which is measured weak on cluster-built graphs (0.15 recall), so x_host_paged flatters the device tier \u2014 the honest comparison is vs the in-hbm row: pq48-ef128 matches its recall 1.0 at 1.4x its QPS while holding 2544 B/point vs the 5184 B/point exact rows that cannot fit"
)


def _big_main() -> None:
    import functools

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    import numpy as np

    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.models.flat import _flat_search_tiled
    from hnsw_rs_tpu.models.paged import HybridPagedHNSW, PagedHNSW, save_paged
    from hnsw_rs_tpu.ops.distance import point_normsq
    from hnsw_rs_tpu.ops.quant import dequantize, quantize
    from hnsw_rs_tpu.utils.datasets import synthetic_clustered

    # PIVOTS=32768: the cluster build emits ~N/96 = ~20.8k per-cluster
    # reps at 2M; a 16384 budget under-covers them and recall collapses
    # to ~0.15 (measured — the DEVNOTES seedless-micro-region mode)
    N, D, M, EFC, K, PIVOTS = 2_000_000, 96, 24, 128, 10, 32768
    NQ = 256
    ds = synthetic_clustered(N, D, n_queries=NQ, seed=7)

    cache = os.path.join(ROOT, ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    idx_dir = os.path.join(cache, f"idx_paged_n{N}_d{D}_m{M}")
    paged_dir = os.path.join(cache, f"paged_n{N}_d{D}_m{M}")
    if os.path.isdir(idx_dir):
        index = HNSW.load(idx_dir)
    else:
        index = HNSW(M, ef_cons=EFC, dim=D)
        index.insert_bulk(
            ds.train, cluster_build=True,
            cluster_kwargs={"pool_p": 96, "points_per_cluster": 96,
                            "fanout": 5, "select_alg4": False,
                            "merge_slots": 48},
        )
        index.save(idx_dir)
    # packed=False: the exact packed table (10.4 GB) does NOT fit — the
    # in-HBM reference is the memory-honest seeded-plain mode
    index.finalize(pivots=PIVOTS, pivot_cover=0.5, packed=False)
    if not os.path.isdir(paged_dir):
        save_paged(index, paged_dir)

    # exact ground truth (tiled flat search over the quantized codes)
    gt_path = os.path.join(cache, f"gt_n{N}_d{D}_q{NQ}.npz")
    if os.path.exists(gt_path):
        truth = np.load(gt_path)["ids"]
    else:
        qq = dequantize(*quantize(jnp.asarray(ds.test)))
        normsq = point_normsq(index.points.codes[:N],
                              index.points.scales[:N])
        _, ti = jax.jit(functools.partial(_flat_search_tiled, k=K))(
            qq, index.points.codes[:N], index.points.scales[:N], normsq
        )
        truth = np.asarray(ti)[:, :K]
        np.savez_compressed(gt_path, ids=truth)
    truth_sets = [set(t) for t in truth]

    def recall(ids):
        return float(np.mean([
            len(set(a) & t) / K for a, t in zip(ids, truth_sets)
        ]))

    out_rows = []

    def write_partial():
        # incremental: each measured row lands in the committed artifact
        # immediately (TPU-worker instability windows can kill long runs
        # — DEVNOTES); rerunning resumes from the cached index
        path = os.path.join(ROOT, "benchmarks", "PAGED_HYBRID.json")
        doc = {}
        if os.path.exists(path):
            with open(path) as f:
                doc = json.load(f)
        doc["beyond_hbm"] = {
            "n": N, "d": D, "m": M, "ef": EF, "k": K,
            "note": _BIG_NOTE,
            "rows": out_rows,
        }
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)

    EF = 64
    # in-HBM reference: memory-honest seeded-plain serving (the honest
    # ceiling a single chip can hold at this N)
    t0 = time.time()
    _, ids_mem = index.ann_batch(ds.test, K, EF)
    dt = time.time() - t0
    mem_sets = [set(t) for t in ids_mem]
    out_rows.append({
        "mode": f"in-hbm-seed-plain-ef{EF}",
        "qps": round(NQ / dt, 1),
        "recall_vs_exact": round(recall(ids_mem), 4),
        "parity_vs_mem": 1.0,
    })
    print(json.dumps(out_rows[-1]), flush=True)
    write_partial()

    def parity(ids):
        return float(np.mean([
            len(set(a) & t) / K for a, t in zip(ids, mem_sets)
        ]))

    host = PagedHNSW(paged_dir, cache_blocks=4096)
    t0 = time.time()
    _, ids_host = host.ann_batch(ds.test, K, EF)
    dt_host = time.time() - t0
    host_qps = NQ / dt_host
    out_rows.append({
        "mode": "host-paged",
        "qps": round(host_qps, 1),
        "recall_vs_exact": round(recall(ids_host), 4),
        "parity_vs_mem": round(parity(ids_host), 4),
    })
    print(json.dumps(out_rows[-1]), flush=True)
    write_partial()
    del host

    for pq_m, ef_pq in ((24, EF), (24, 2 * EF), (48, 2 * EF), (48, 4 * EF)):
        pq = HybridPagedHNSW(paged_dir, pivots=PIVOTS, pq_m=pq_m,
                             pq_bits=4, cache_blocks=4096)
        _, _ = pq.ann_batch(ds.test[:32], K, ef_pq)  # warm compiles
        t0 = time.time()
        _, ids_pq = pq.ann_batch(ds.test, K, ef_pq)
        dt_pq = time.time() - t0
        out_rows.append({
            "mode": f"hybrid-pq-tier-4bit-m{pq_m}-ef{ef_pq}",
            "qps": round(NQ / dt_pq, 1),
            "x_host_paged": round((NQ / dt_pq) / host_qps, 2),
            "recall_vs_exact": round(recall(ids_pq), 4),
            "parity_vs_mem": round(parity(ids_pq), 4),
            "device_bytes_per_point": round(pq.device_bytes / N, 1),
            "exact_packed_bytes_per_point": index.graph.get_layer(0).shape[1]
            * (D + 12),
        })
        print(json.dumps(out_rows[-1]), flush=True)
        write_partial()
        del pq

    path = os.path.join(ROOT, "benchmarks", "PAGED_HYBRID.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc["beyond_hbm"] = {
        "n": N, "d": D, "m": M, "ef": EF, "k": K,
        "note": _BIG_NOTE,
        "rows": out_rows,
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"wrote {path} (beyond_hbm)")


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np

    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.models.paged import HybridPagedHNSW, PagedHNSW, save_paged
    from hnsw_rs_tpu.utils.datasets import synthetic_clustered

    N = 50_000 if "--quick" in sys.argv else 200_000
    D, M, EFC, K, EF = 96, 16, 96, 10, 64
    ds = synthetic_clustered(N, D, n_queries=256, seed=7)

    cache = os.path.join(ROOT, ".bench_cache")
    idx_dir = os.path.join(cache, f"idx_paged_n{N}_d{D}_m{M}")
    os.makedirs(cache, exist_ok=True)
    if os.path.isdir(idx_dir):
        index = HNSW.load(idx_dir)
    else:
        index = HNSW(M, ef_cons=EFC, dim=D)
        index.insert_bulk(ds.train)
        index.save(idx_dir)
    index.finalize(pivots=4096)
    paged_dir = os.path.join(cache, f"paged_n{N}_d{D}_m{M}")
    if not os.path.isdir(paged_dir):
        save_paged(index, paged_dir)

    # in-memory packed+seeded reference answers (recall-parity target)
    t_mem, ids_mem = index.ann_batch(ds.test, K, EF)

    cap0 = index.graph.get_layer(0).shape[1]
    wrow = cap0 * (D + 12)
    hot_bytes = (N // 2) * wrow  # hot tier = half the packed rows

    out = {"n": N, "d": D, "m": M, "ef": EF, "k": K,
           "hot_fraction": 0.5, "rows": []}

    def parity(ids):
        return float(np.mean([
            len(set(a) & set(b)) / K for a, b in zip(ids, ids_mem)
        ]))

    # host-side exact paged reader (the round-2 correctness baseline)
    host = PagedHNSW(paged_dir, cache_blocks=4096)
    t0 = time.time()
    _, ids_host = host.ann_batch(ds.test, K, EF)
    dt_host = time.time() - t0
    out["rows"].append({
        "mode": "host-paged", "qps": round(len(ds.test) / dt_host, 1),
        "parity_vs_mem": round(parity(ids_host), 4),
    })
    print(json.dumps(out["rows"][-1]), flush=True)

    hyb = HybridPagedHNSW(paged_dir, hot_bytes=hot_bytes, pivots=4096,
                          cache_blocks=4096)
    _, _ = hyb.ann_batch(ds.test[:32], K, EF)  # warm compiles
    for e in (1, 4):
        hyb.hits = hyb.misses = 0
        t0 = time.time()
        _, ids_hyb = hyb.ann_batch(ds.test, K, EF, expand_e=e)
        dt_hyb = time.time() - t0
        exp = hyb.hits + hyb.misses
        out["rows"].append({
            "mode": f"hybrid-hot-tier-e{e}",
            "qps": round(len(ds.test) / dt_hyb, 1),
            "parity_vs_mem": round(parity(ids_hyb), 4),
            "hot_hit_rate": round(hyb.hits / max(exp, 1), 4),
            "hot_rows": hyb.hot_rows,
            "expansions": exp,
            "dispatches_per_batch": hyb.dispatches,
        })
        print(json.dumps(out["rows"][-1]), flush=True)

    # PQ-tier mode (round 4): device-resident PQ-packed rows + on-device
    # ADC beam (zero per-iteration staging), ONE disk-paged exact rerank
    # per batch — the redesign after the exact hot tier measured SLOWER
    # than host-paged through this tunnel (round-3 rows above, kept for
    # the record). pq_m=12 B/point at 4 bits: 24 subspaces over d=96.
    # (pq_m, ef): the ADC beam's path diverges from the exact beam at
    # low code rates (ADC ordering noise inside a neighborhood), so
    # parity is bought with beam depth or code bytes — both still leave
    # the device tier several x over host-paged QPS
    for pq_m, ef_pq in ((12, EF), (24, EF), (24, 2 * EF), (48, EF),
                        (48, 2 * EF)):
        pq = HybridPagedHNSW(paged_dir, pivots=4096, pq_m=pq_m, pq_bits=4,
                             cache_blocks=4096)
        _, _ = pq.ann_batch(ds.test[:32], K, ef_pq)  # warm compiles
        t0 = time.time()
        _, ids_pq = pq.ann_batch(ds.test, K, ef_pq)
        dt_pq = time.time() - t0
        out["rows"].append({
            "mode": f"hybrid-pq-tier-4bit-m{pq_m}-ef{ef_pq}",
            "qps": round(len(ds.test) / dt_pq, 1),
            "parity_vs_mem": round(parity(ids_pq), 4),
            "device_bytes_per_point": round(pq.device_bytes / N, 1),
            "exact_packed_bytes_per_point": wrow,
        })
        print(json.dumps(out["rows"][-1]), flush=True)
        del pq

    with open(os.path.join(ROOT, "benchmarks", "PAGED_HYBRID.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote benchmarks/PAGED_HYBRID.json")


if __name__ == "__main__":
    if "--big" in sys.argv:
        _big_main()
    else:
        main()

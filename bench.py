"""Headline benchmark: batched query QPS at recall@10 >= 0.99 on the
bundled GloVe set (the reference's quality gate, ``hnsw/src/template.rs:
519-572``, and its README throughput claim of ~300 req/s single-thread).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever device jax picks (the driver provides the TPU).

Measurement notes: results are synced via an on-device scalar checksum so
the timing covers compute, not the dev tunnel's slow device->host pipe;
the build is timed on a second, compile-cache-warm run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    import numpy as np

    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.models.hnsw import _ann_jit
    from hnsw_rs_tpu.ops.quant import dequantize, quantize
    from hnsw_rs_tpu.utils import brute_force_nns, load_glove_array

    root = os.path.dirname(os.path.abspath(__file__))
    _, stored = load_glove_array(os.path.join(root, "test-data", "store.txt"))
    _, queries = load_glove_array(os.path.join(root, "test-data", "queries.txt"))
    k = 10

    def build():
        idx = HNSW(12, dim=stored.shape[1])
        idx.insert_bulk(stored)
        # force device completion via tiny checksums
        for a in idx.graph.adjs:
            int(jnp.sum(jnp.abs(a) % 7))
        return idx

    index = build()  # pays compilation
    t0 = time.time()
    index = build()  # compile-cache warm: real build throughput
    build_s = time.time() - t0
    build_rate = len(index) / build_s

    truth = brute_force_nns(queries, index.points.codes, index.points.scales, k)

    adjs = tuple(index.graph.adjs)
    codes, scales = index._serving_table(), index.points.scales
    ep = jnp.asarray(index.params.ep, jnp.int32)

    # smallest ef from the sweep that clears the 0.99 recall gate
    chosen = None
    for ef in (24, 32, 40, 48, 64, 100):
        _, ann = index.ann_batch(queries, k, ef)
        recall = np.mean([len(set(a) & set(b)) / k for a, b in zip(ann, truth)])
        if recall >= 0.99:
            chosen = (ef, float(recall))
            break
    if chosen is None:
        chosen = (100, float(recall))
    ef, recall = chosen
    max_iters = 2 * ef + 16

    import functools

    @functools.partial(jax.jit, static_argnames=("ef", "k", "mi"))
    def search_sum(q, ef, k, mi):
        d, i = _ann_jit(adjs, codes, scales, q, ep, ef, k, mi)
        return jnp.sum(i) + jnp.sum(d).astype(jnp.int32)

    batch = 16384
    reps = int(np.ceil(batch / queries.shape[0]))
    big = np.tile(queries, (reps, 1))[:batch]
    qc, qs = quantize(jnp.asarray(big))
    q = dequantize(qc, qs)

    int(search_sum(q, ef, k, max_iters))  # warm/compile
    t0 = time.time()
    iters = 0
    while time.time() - t0 < 5.0 or iters < 3:
        int(search_sum(q, ef, k, max_iters))
        iters += 1
    dt = time.time() - t0
    qps = batch * iters / dt

    print(
        json.dumps(
            {
                "metric": f"QPS/chip at recall@10>=0.99 (GloVe 50d, ef={ef}, recall={recall:.3f}; build {build_rate:.0f} vec/s)",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / 300.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Headline benchmark: batched query QPS at recall@10 >= 0.99 on the
bundled GloVe set (the reference's quality gate, ``hnsw/src/template.rs:
519-572``, and its README throughput claim of ~300 req/s single-thread).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever device jax picks (the driver provides the TPU).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hnsw_rs_tpu import HNSW
    from hnsw_rs_tpu.models.hnsw import _ann_jit
    from hnsw_rs_tpu.ops.quant import dequantize, quantize
    from hnsw_rs_tpu.utils import brute_force_nns, load_glove_array

    root = os.path.dirname(os.path.abspath(__file__))
    _, stored = load_glove_array(os.path.join(root, "test-data", "store.txt"))
    _, queries = load_glove_array(os.path.join(root, "test-data", "queries.txt"))
    k = 10

    t0 = time.time()
    index = HNSW(12, dim=stored.shape[1])
    index.insert_bulk(stored)
    # force build completion (device work is async)
    np.asarray(index.graph.get_layer(0))
    build_s = time.time() - t0
    build_rate = len(index) / build_s

    truth = brute_force_nns(queries, index.points.codes, index.points.scales, k)

    # smallest ef from the sweep that clears the 0.99 recall gate
    chosen = None
    for ef in (24, 32, 48, 64, 100):
        _, ann = index.ann_batch(queries, k, ef)
        recall = np.mean(
            [len(set(a) & set(b)) / k for a, b in zip(ann, truth)]
        )
        if recall >= 0.99:
            chosen = (ef, float(recall))
            break
    if chosen is None:
        chosen = (100, float(recall))
    ef, recall = chosen

    # throughput: large tiled batch through the jitted pipeline
    batch = 4096
    reps = int(np.ceil(batch / queries.shape[0]))
    big = np.tile(queries, (reps, 1))[:batch]
    qc, qs = quantize(jnp.asarray(big))
    q = dequantize(qc, qs)
    adjs = tuple(index.graph.adjs)
    ep = jnp.asarray(index.params.ep, jnp.int32)
    max_iters = 2 * ef + 16

    def run():
        d, i = _ann_jit(adjs, index.points.codes, index.points.scales, q, ep, ef, k, max_iters)
        jax.block_until_ready((d, i))
        return np.asarray(i)  # force real completion (async platforms)

    run()  # warm/compile
    t0 = time.time()
    iters = 0
    while time.time() - t0 < 3.0 or iters < 3:
        run()
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

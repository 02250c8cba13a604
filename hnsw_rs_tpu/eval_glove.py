"""GloVe evaluation CLI — the ``eval_glove`` binary equivalent
(``eval_glove/src/main.rs:17-121``), grown up: timed bulk build, one
incremental insert, recall/QPS sweep over ef values against on-device
brute force, optional save/load round-trip timing, reference-format
import, and the interactive nearest-word REPL the reference left
commented out (``main.rs:102-121``).

Run: ``python -m hnsw_rs_tpu.eval_glove [--store F] [--m 12] [--ef 50 100]``
"""

from __future__ import annotations

import sys
import time

import numpy as np

from .models.hnsw import HNSW
from .utils.args import eval_parser
from .utils.glove import brute_force_nns, load_glove_array
from .utils.logging import get_logger

log = get_logger("eval_glove")


def recall_at_k(ann: np.ndarray, truth: np.ndarray, k: int) -> float:
    return float(
        np.mean([len(set(a[:k]) & set(t[:k])) / k for a, t in zip(ann, truth)])
    )


def main(argv=None) -> int:
    args = eval_parser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    verbose = not args.quiet

    words, stored = load_glove_array(args.store, args.lim, verbose=verbose)
    qpath = args.queries or args.store
    qwords, queries = load_glove_array(qpath, args.lim, verbose=verbose)
    log.info("loaded %d stored / %d query vectors (dim %d)",
             len(stored), len(queries), stored.shape[1])

    if args.model != "hnsw":
        return eval_other_model(args, stored, queries)

    if args.load:
        t0 = time.time()
        index = HNSW.load(args.load)
        log.info("loaded index from %s in %.2fs", args.load, time.time() - t0)
    elif args.import_reference:
        from .utils.serializer import import_reference_index

        t0 = time.time()
        index = import_reference_index(args.import_reference)
        log.info("imported reference index from %s in %.2fs",
                 args.import_reference, time.time() - t0)
    else:
        index = HNSW(args.m, ef_cons=args.ef_cons, dim=stored.shape[1],
                     metric=args.metric)
        t0 = time.time()
        kw = {}
        if args.build_seeded:
            kw["build_seeded"] = True
        if args.cluster_build:
            kw["cluster_build"] = True
        if args.build_mi is not None:
            kw["max_iters"] = args.build_mi
        index.insert_bulk(stored, verbose=verbose,
                          build_expand=args.build_expand, **kw)
        np.asarray(index.graph.get_layer(0))  # force async build completion
        dt = time.time() - t0
        log.info("built index: %d vectors in %.2fs (%.0f vec/s, includes "
                 "compilation)", len(index), dt, len(index) / dt)
        # one incremental insert, like the reference binary (main.rs:40)
        index.insert_vec(stored[0])
        log.info("insert_vec -> id %d (len %d)", len(index) - 1, len(index))

    index.print_index()

    truth = brute_force_nns(
        queries, index.points.codes, index.points.scales, args.k
    )
    if args.expand > 1 or args.pivots > 0 or args.pq_m > 0:
        # packed/seeded/PQ serving
        index.finalize(expand=args.expand, pivots=args.pivots,
                       pq_m=args.pq_m)
    print(f"\n ef    recall@{args.k}   QPS")
    batch = args.batch or len(queries)
    reps = max(1, -(-batch // len(queries)))
    big = np.tile(queries, (reps, 1))[:batch]
    for ef in args.ef:
        _, ann = index.ann_batch(queries, args.k, ef)
        rec = recall_at_k(ann, truth, args.k)
        index.ann_batch(big, args.k, ef)  # warm/compile for this batch
        t0 = time.time()
        iters = 0
        while time.time() - t0 < 1.0:
            index.ann_batch(big, args.k, ef)
            iters += 1
        qps = batch * iters / (time.time() - t0)
        print(f"{ef:4d}   {rec:.4f}   {qps:10.0f}")

    if args.save:
        t0 = time.time()
        index.save(args.save)
        log.info("saved to %s in %.2fs", args.save, time.time() - t0)
        t0 = time.time()
        HNSW.load(args.save)
        log.info("reloaded in %.2fs", time.time() - t0)

    index.assert_param_compliance(verbose=verbose)

    if args.words:
        show_nn_words(index, words, args.k)
    return 0


def eval_other_model(args, stored, queries) -> int:
    """Evaluate the Flat, IVF-Flat or IVF-PQ family on the same data."""
    from .models.flat import FlatIndex
    from .models.ivf import IVFFlatIndex

    k = args.k
    if args.metric == "cosine":
        from .ops.distance import normalize

        stored = np.asarray(normalize(stored))
        queries = np.asarray(normalize(queries))
    if args.model == "flat":
        index = FlatIndex(stored.shape[1], metric=args.metric)
        t0 = time.time()
        index.add(stored)
        log.info("flat add: %d vectors in %.2fs", len(index), time.time() - t0)
        sweeps = [("exact", {})]
        search = lambda q, **kw: index.search(q, k)
    elif args.model == "pq":
        from .models.ivfpq import IVFPQIndex

        d = stored.shape[1]
        m_pq = next(m for m in (16, 10, 8, 5, 4, 2, 1) if d % m == 0)
        index = IVFPQIndex(
            d, n_lists=args.n_lists, m_pq=m_pq, metric=args.metric,
            rerank=4 * k,
        )
        t0 = time.time()
        index.train_add(stored)
        log.info("ivf-pq train+add: %d vectors, %d lists, m_pq=%d in %.2fs",
                 len(index), index.n_lists, m_pq, time.time() - t0)
        sweeps = [(f"probe={p}", {"n_probe": p}) for p in args.probe]
        search = lambda q, **kw: index.search(q, k, **kw)
    else:
        index = IVFFlatIndex(
            stored.shape[1], n_lists=args.n_lists, metric=args.metric
        )
        t0 = time.time()
        index.train_add(stored)
        log.info("ivf train+add: %d vectors, %d lists in %.2fs",
                 len(index), index.n_lists, time.time() - t0)
        sweeps = [(f"probe={p}", {"n_probe": p}) for p in args.probe]
        search = lambda q, **kw: index.search(q, k, **kw)

    truth = brute_force_nns(queries, index.codes, index.scales, k)
    batch = args.batch or len(queries)
    reps = max(1, -(-batch // len(queries)))
    big = np.tile(queries, (reps, 1))[:batch]
    print(f"\n setting    recall@{k}   QPS")
    for label, kw in sweeps:
        _, ann = search(queries, **kw)
        rec = recall_at_k(ann, truth, k)
        search(big, **kw)
        t0 = time.time()
        iters = 0
        while time.time() - t0 < 1.0:
            search(big, **kw)
            iters += 1
        qps = batch * iters / (time.time() - t0)
        print(f"{label:>9s}   {rec:.4f}   {qps:10.0f}")
    return 0


def show_nn_words(index: HNSW, words: list[str], k: int) -> None:
    """Interactive nearest-word REPL (``show_nn_words``,
    ``eval_glove/src/main.rs:102-121``)."""
    by_word = {w: i for i, w in enumerate(words)}
    print("type a word (empty line to quit):")
    for line in sys.stdin:
        w = line.strip()
        if not w:
            break
        if w not in by_word:
            print(f"  {w!r} not in vocabulary")
            continue
        v = index.get_point(by_word[w]).values
        ids = index.ann_by_vector(v, k + 1, ef=1000)
        # padded results carry PAD_ID when fewer than k+1 points are
        # reachable; keep only real vocabulary ids
        ids = [int(i) for i in ids if 0 <= int(i) < len(words)]
        names = [words[i] for i in ids if i != by_word[w]][:k]
        print(f"  {w}: {', '.join(names)}")


if __name__ == "__main__":
    raise SystemExit(main())

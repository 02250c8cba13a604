"""Out-of-core HNSW serving: beam search over a disk-resident index.

The ambition behind the reference's ``HNSWDisk`` (``hnsw/src/disk.rs:
22-109``), whose graph half is stubs (``disk.rs:102-109``): serve an
index LARGER THAN DEVICE MEMORY. Layout (DiskANN-style split):

- upper layers (a ~1/m fraction of nodes) live in memory — they are the
  routing skeleton and tiny;
- layer 0's fixed-slot adjacency is a disk ``memmap`` (the OS page cache
  is the natural LRU for hot graph regions);
- layer 0's vectors page through :class:`..store_paged.BlockStore`'s
  block LRU (arithmetic block offsets, positioned reads).

The beam itself runs HOST-side with the exact flagged-beam semantics of
``search.search_layer`` (same (d2, id) order, same beam-membership +
ring dedup, same termination). Rationale: the paged regime is IO-bound
by construction, and each lockstep iteration needs a random set of
neighbor codes — on this dev tunnel a device round-trip per iteration
costs ~33 ms dispatch + ~1 s shipping the codes through the ~5 MB/s
host→device pipe, versus microseconds of host arithmetic. (The
streaming *exact* search, which IS device-friendly because its reads
are sequential, lives in ``BlockStore.search_streaming``.)

Working set: O(batch × ef + block cache + OS page cache) — independent
of N. Recall parity with the in-memory index is pinned by test
(tests/test_paged.py): identical beam semantics on identical data.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..params import Params
from ..store_paged import BlockStore, write_block_store

PAD_ID = np.iinfo(np.int32).max
_ADJ_FILE = "layer0.adj"
_UPPER_FILE = "upper.npz"
_POINTS_FILE = "points.blocks"
_META_FILE = "paged.json"


def save_paged(index, path: str) -> None:
    """Write an :class:`..models.hnsw.HNSW` index in the paged layout."""
    index.flush()
    os.makedirs(path, exist_ok=True)
    n = len(index)
    codes = np.asarray(index.points.codes)[:n]
    scales = np.asarray(index.points.scales)[:n]
    levels = np.asarray(index.points.levels)[:n]
    write_block_store(os.path.join(path, _POINTS_FILE), codes, scales, levels)
    adj0 = np.ascontiguousarray(
        np.asarray(index.graph.get_layer(0))[:n], dtype=np.int32
    )
    adj0.tofile(os.path.join(path, _ADJ_FILE))
    upper = {
        f"adj_{i}": np.asarray(index.graph.get_layer(i))[:n]
        for i in range(1, len(index.graph))
    }
    upper["levels"] = levels
    np.savez_compressed(os.path.join(path, _UPPER_FILE), **upper)
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(
            {
                "n": int(n),
                "cap0": int(adj0.shape[1]),
                "n_layers": len(index.graph),
                "params": index.params.to_dict(),
            },
            f,
        )


class PagedHNSW:
    """Query-only HNSW over the paged on-disk layout."""

    def __init__(self, path: str, cache_blocks: int = 1024):
        with open(os.path.join(path, _META_FILE)) as f:
            meta = json.load(f)
        self.n = int(meta["n"])
        self.params = Params.from_dict(meta["params"])
        self.store = BlockStore(
            os.path.join(path, _POINTS_FILE), cache_blocks=cache_blocks
        )
        self.adj0 = np.memmap(
            os.path.join(path, _ADJ_FILE), dtype=np.int32, mode="r",
            shape=(self.n, int(meta["cap0"])),
        )
        with np.load(os.path.join(path, _UPPER_FILE)) as z:
            self.upper = [
                z[f"adj_{i}"] for i in range(1, int(meta["n_layers"]))
            ]
            self.levels = z["levels"]

    def __len__(self) -> int:
        return self.n

    # -- paged vector access -------------------------------------------------

    def _values(self, ids: np.ndarray) -> np.ndarray:
        """Dequantized vectors for a flat id array, block-batched through
        the BlockStore LRU (one decode per touched block)."""
        ids = np.asarray(ids, np.int64).ravel()
        out = np.empty((ids.size, self.store.dim), np.float32)
        blocks = ids // self.store.max_per_block
        pos = ids % self.store.max_per_block
        for b in np.unique(blocks):
            codes, scales, _ = self.store._load_block(int(b))
            sel = blocks == b
            p = pos[sel]
            out[sel] = (
                codes[p].astype(np.float32) * scales[p, 1:2] + scales[p, 0:1]
            )
        return out

    def _d2(self, q: np.ndarray, ids: np.ndarray) -> np.ndarray:
        """Squared L2 from per-row queries to per-row id sets:
        q [B, d], ids [B, K] -> [B, K] (invalid ids give garbage —
        callers mask)."""
        b, k = ids.shape
        vec = self._values(np.clip(ids, 0, self.n - 1)).reshape(b, k, -1)
        diff = vec - q[:, None, :]
        return np.einsum("bkd,bkd->bk", diff, diff, dtype=np.float32)

    # -- query ----------------------------------------------------------------

    def ann_batch(
        self, queries: np.ndarray, n: int, ef: int, max_iters: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched query with ``search.search_layer`` semantics: greedy
        upper-layer descent, flagged-beam layer 0 paged from disk.
        Returns (distances [B, n], ids [B, n])."""
        from ..ops.quant import quantize

        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if self.params.metric == "cosine":
            nn = np.linalg.norm(queries, axis=-1, keepdims=True)
            queries = queries / np.where(nn > 0, nn, 1.0)
        # queries live in quantized space (template.rs:313)
        c, s = (np.asarray(x) for x in quantize(queries))
        q = c.astype(np.float32) * s[:, 1:2] + s[:, 0:1]
        ef = max(ef, n)
        if max_iters is None:
            max_iters = 2 * ef + 16
        b = q.shape[0]

        cur = np.full((b,), self.params.ep, np.int32)
        cur_d2 = self._d2(q, cur[:, None])[:, 0]
        for adj in reversed(self.upper):  # greedy ef=1 descent
            while True:
                nbrs = np.asarray(adj[cur])  # [B, cap]
                valid = nbrs >= 0
                d2 = np.where(valid, self._d2(q, nbrs), np.inf)
                nids = np.where(valid, nbrs, PAD_ID)
                j = np.lexsort((nids, d2), axis=-1)[:, 0]
                bd = d2[np.arange(b), j]
                bi = nids[np.arange(b), j]
                better = (bd < cur_d2) | ((bd == cur_d2) & (bi < cur))
                if not better.any():
                    break
                cur_d2 = np.where(better, bd, cur_d2)
                cur = np.where(better, bi, cur).astype(np.int32)

        # layer-0 flagged beam (search.search_layer semantics)
        cap = self.adj0.shape[1]
        ring_size = max(2 * cap, 64)
        beam_d2 = np.full((b, ef), np.inf, np.float32)
        beam_ids = np.full((b, ef), PAD_ID, np.int32)
        beam_exp = np.ones((b, ef), bool)
        beam_d2[:, 0] = cur_d2
        beam_ids[:, 0] = cur
        beam_exp[:, 0] = False
        ring = np.full((b, ring_size), PAD_ID, np.int32)
        ring[:, 0] = cur
        rows = np.arange(b)

        for _ in range(max_iters):
            unexp = ~beam_exp
            active = unexp.any(axis=1)
            if not active.any():
                break
            pos = unexp.argmax(axis=1)
            cand = beam_ids[rows, pos]
            beam_exp[rows, pos] = True

            nbrs = np.asarray(self.adj0[np.clip(cand, 0, self.n - 1)])
            valid = (nbrs >= 0) & active[:, None]
            safe = np.where(valid, nbrs, 0)
            known = (safe[:, :, None] == beam_ids[:, None, :]).any(-1) | (
                safe[:, :, None] == ring[:, None, :]
            ).any(-1)
            new = valid & ~known
            ring = np.concatenate(
                [np.where(new, nbrs, PAD_ID), ring[:, : ring_size - cap]], 1
            )
            nd2 = np.where(new, self._d2(q, safe), np.inf)
            nids = np.where(new, nbrs, PAD_ID)

            md = np.concatenate([beam_d2, nd2], 1)
            mi = np.concatenate([beam_ids, nids], 1)
            me = np.concatenate([beam_exp, ~new], 1)
            order = np.lexsort((mi, md), axis=-1)[:, :ef]
            beam_d2 = np.take_along_axis(md, order, 1)
            beam_ids = np.take_along_axis(mi, order, 1)
            beam_exp = np.take_along_axis(me, order, 1)

        return np.sqrt(beam_d2[:, :n]), beam_ids[:, :n]

    def ann_by_vector(self, vector: np.ndarray, n: int, ef: int) -> np.ndarray:
        return self.ann_batch(np.asarray(vector, np.float32)[None], n, ef)[1][0]

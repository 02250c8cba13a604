"""IVF-Flat: inverted-file index with exact in-list distances.

A second index family beyond HNSW/Flat, added because it is the natural
TPU-first ANN design (in the spirit of TPU-KNN/ScaNN): HNSW's per-neighbor
row gathers are latency/row-rate bound on TPU, while IVF reads whole
*contiguous* cluster blocks — every byte moved is a big sequential DMA and
every FLOP is a batched matmul on the MXU:

1. coarse quantizer: k-means centroids, trained on device (batched
   Lloyd's iterations — assignment is one matmul + argmin, update is one
   scatter-add);
2. storage: points sorted by list, padded per-list to a fixed width, so a
   "probe" is a single [Lmax, d] block load;
3. search: centroid distances [B, C] on the MXU -> top-``n_probe`` lists
   -> gather those blocks -> fused distances -> top-k (dist, id) sort.

No reference analogue (the reference has only HNSW + a scalar brute-force
helper); quantization/distance semantics are shared with the rest of the
framework (``ops/quant.py``, ``vectors/src/quant.rs`` parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import DimensionMismatch
from ..ops.distance import l2sq, normalize
from ..ops.quant import dequantize, quantize
from ..ops.topk import INF, PAD_ID, sort_dist_id


@functools.partial(jax.jit, static_argnames=("iters", "c"))
def _kmeans(x: jnp.ndarray, init_idx: jnp.ndarray, c: int, iters: int):
    """Batched Lloyd's k-means on device. x: f32[N, d] -> centroids
    f32[c, d], assignment i32[N]."""
    cent = x[init_idx]

    def step(cent, _):
        d2 = (
            jnp.sum(x * x, 1, keepdims=True)
            - 2.0 * jnp.dot(x, cent.T, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            + jnp.sum(cent * cent, 1)[None, :]
        )
        assign = jnp.argmin(d2, 1)
        oh = assign
        sums = jnp.zeros_like(cent).at[oh].add(x)
        counts = jnp.zeros((c,), jnp.float32).at[oh].add(1.0)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], cent)
        return new, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    d2 = (
        jnp.sum(x * x, 1, keepdims=True)
        - 2.0 * jnp.dot(x, cent.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(cent * cent, 1)[None, :]
    )
    return cent, jnp.argmin(d2, 1)


@functools.partial(jax.jit, static_argnames=("n_probe", "k"))
def _ivf_search(q, centroids, blocks, block_ids, n_probe: int, k: int):
    """q f32[B, d]; blocks f32[C, Lmax, d]; block_ids i32[C, Lmax]."""
    cd2 = (
        jnp.sum(q * q, 1, keepdims=True)
        - 2.0 * jnp.dot(q, centroids.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(centroids * centroids, 1)[None, :]
    )
    _, probe = jax.lax.top_k(-cd2, n_probe)  # [B, p] list indices
    cand = blocks[probe]  # [B, p, Lmax, d] — contiguous block gather
    cand_ids = block_ids[probe]  # [B, p, Lmax]
    b, p, lmax, d = cand.shape
    d2 = l2sq(q[:, None, None, :], cand).reshape(b, p * lmax)
    ids = cand_ids.reshape(b, p * lmax)
    d2 = jnp.where(ids >= 0, d2, INF)
    ids = jnp.where(ids >= 0, ids, PAD_ID)
    sd, si = sort_dist_id(d2, ids)
    return jnp.sqrt(sd[:, :k]), si[:, :k]


class IVFFlatIndex:
    """Inverted-file index with exact (quantized-space) distances."""

    def __init__(
        self,
        dim: int,
        n_lists: int = 0,
        n_probe: int = 8,
        kmeans_iters: int = 10,
        seed: int = 0,
        metric: str = "l2",
    ):
        if metric not in ("l2", "cosine"):
            raise ValueError(f"unknown metric {metric!r}")
        self.metric = metric
        self.dim = int(dim)
        self.n_lists = int(n_lists)
        self.n_probe = int(n_probe)
        self.kmeans_iters = int(kmeans_iters)
        self.seed = seed
        self.centroids = None
        self.blocks = None  # f32[C, Lmax, d] dequantized
        self.block_ids = None  # i32[C, Lmax]
        self.codes = None  # u8[N, d] (kept for parity/persistence)
        self.scales = None
        self._n = 0

    def __len__(self) -> int:
        return self._n

    def train_add(self, vectors: np.ndarray) -> np.ndarray:
        """Train the coarse quantizer and add all vectors (bulk build)."""
        vectors = np.atleast_2d(np.asarray(vectors, np.float32))
        if vectors.shape[-1] != self.dim:
            raise DimensionMismatch(
                f"index dim {self.dim}, got {vectors.shape[-1]}"
            )
        if self.metric == "cosine":
            vectors = np.asarray(normalize(vectors))
        n = vectors.shape[0]
        if self.n_lists <= 0:
            self.n_lists = max(1, int(np.sqrt(n)))
        c = min(self.n_lists, n)
        self.n_lists = c
        self.codes, self.scales = quantize(jnp.asarray(vectors))
        x = dequantize(self.codes, self.scales)
        rng = np.random.default_rng(self.seed)
        init = jnp.asarray(rng.choice(n, size=c, replace=False).astype(np.int32))
        cent, assign = _kmeans(x, init, c, self.kmeans_iters)
        self.centroids = cent
        assign = np.asarray(assign)
        # sort points by list; pad lists to the max occupancy
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=c)
        lmax = max(1, int(counts.max()))
        blocks = np.zeros((c, lmax, self.dim), np.float32)
        bids = np.full((c, lmax), -1, np.int32)
        xs = np.asarray(x)[order]
        start = 0
        for li in range(c):
            k = counts[li]
            blocks[li, :k] = xs[start : start + k]
            bids[li, :k] = order[start : start + k]
            start += k
        self.blocks = jnp.asarray(blocks)
        self.block_ids = jnp.asarray(bids)
        self._n = n
        return np.arange(n, dtype=np.int32)

    def search(
        self, queries: np.ndarray, k: int, n_probe: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched top-k: (distances [B, k], ids [B, k])."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if self.metric == "cosine":
            queries = np.asarray(normalize(queries))
        q = dequantize(*quantize(jnp.asarray(queries)))
        p = min(n_probe or self.n_probe, self.n_lists)
        d, i = _ivf_search(q, self.centroids, self.blocks, self.block_ids, p, k)
        return np.asarray(d), np.asarray(i)

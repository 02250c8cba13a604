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
   "probe" is a single [Lmax, d] block load. Blocks are stored QUANTIZED
   (u8 codes + per-point scales, 4x less HBM moved per probe) by default;
   ``quantized_blocks=False`` keeps a dequantized f32 copy instead —
   distances are identical either way (dequantization is exact);
3. search: centroid distances [B, C] on the MXU -> top-``n_probe`` lists
   -> gather those blocks -> fused distances -> top-k (dist, id) sort.

Supports incremental :meth:`add` after training (assign to the nearest
centroid + vectorized repack) and :meth:`retrain` (re-run k-means over
everything stored when the distribution has drifted).

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
    f32[c, d], assignment i32[N]. Empty clusters keep their previous
    centroid."""
    cent = x[init_idx]

    def step(cent, _):
        d2 = (
            jnp.sum(x * x, 1, keepdims=True)
            - 2.0 * jnp.dot(x, cent.T, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
            + jnp.sum(cent * cent, 1)[None, :]
        )
        assign = jnp.argmin(d2, 1)
        sums = jnp.zeros_like(cent).at[assign].add(x)
        counts = jnp.zeros((c,), jnp.float32).at[assign].add(1.0)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], cent)
        return new, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent, _assign_jit(x, cent)


@jax.jit
def _assign_jit(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    """Nearest-centroid assignment: one MXU matmul + argmin."""
    d2 = (
        jnp.sum(x * x, 1, keepdims=True)
        - 2.0 * jnp.dot(x, centroids.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(centroids * centroids, 1)[None, :]
    )
    return jnp.argmin(d2, 1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_probe", "k"))
def _ivf_search(q, centroids, blocks, bscales, block_ids, n_probe: int, k: int):
    """q f32[B, d]; blocks u8/f32[C, Lmax, d]; bscales f32[C, Lmax, 2] or
    None (f32 blocks); block_ids i32[C, Lmax]."""
    cd2 = (
        jnp.sum(q * q, 1, keepdims=True)
        - 2.0 * jnp.dot(q, centroids.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        + jnp.sum(centroids * centroids, 1)[None, :]
    )
    _, probe = jax.lax.top_k(-cd2, n_probe)  # [B, p] list indices
    cand = blocks[probe]  # [B, p, Lmax, d] — contiguous block gather
    cand_ids = block_ids[probe]  # [B, p, Lmax]
    if bscales is not None:  # quantized blocks: dequantize in-register
        s = bscales[probe]  # [B, p, Lmax, 2]
        cand = cand.astype(jnp.float32) * s[..., 1:2] + s[..., 0:1]
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
        quantized_blocks: bool = True,
    ):
        if metric not in ("l2", "cosine"):
            raise ValueError(f"unknown metric {metric!r}")
        self.metric = metric
        self.dim = int(dim)
        self.n_lists = int(n_lists)
        self.n_probe = int(n_probe)
        self.kmeans_iters = int(kmeans_iters)
        self.seed = seed
        self.quantized_blocks = quantized_blocks
        self.centroids = None
        self.blocks = None  # u8 (or f32) [C, Lmax, d]
        self.bscales = None  # f32[C, Lmax, 2] when quantized_blocks
        self.block_ids = None  # i32[C, Lmax]
        self.codes = None  # u8[N, d] (source of truth for repack/persist)
        self.scales = None  # f32[N, 2]
        self._assign = None  # i32[N] host-side list assignment
        self._n = 0

    def __len__(self) -> int:
        return self._n

    # -- construction --------------------------------------------------

    def train_add(self, vectors: np.ndarray) -> np.ndarray:
        """Train the coarse quantizer and add all vectors (bulk build)."""
        vectors = self._prep(vectors)
        n = vectors.shape[0]
        if self.n_lists <= 0:
            self.n_lists = max(1, int(np.sqrt(n)))
        c = min(self.n_lists, n)
        self.n_lists = c
        self.codes, self.scales = quantize(jnp.asarray(vectors))
        self._n = n
        x = dequantize(self.codes, self.scales)
        rng = np.random.default_rng(self.seed)
        init = jnp.asarray(rng.choice(n, size=c, replace=False).astype(np.int32))
        cent, assign = _kmeans(x, init, c, self.kmeans_iters)
        self.centroids = cent
        self._assign = np.asarray(assign)
        self._pack()
        return np.arange(n, dtype=np.int32)

    def add(self, vectors: np.ndarray) -> np.ndarray:
        """Incremental add after training: assign each new vector to its
        nearest centroid and repack the list blocks. Ids are stable row
        positions. On an untrained index this is :meth:`train_add`."""
        if self.centroids is None:
            return self.train_add(vectors)
        vectors = self._prep(vectors)
        n_new = vectors.shape[0]
        codes, scales = quantize(jnp.asarray(vectors))
        assign = np.asarray(_assign_jit(dequantize(codes, scales), self.centroids))
        start = self._n
        self.codes = jnp.concatenate([self.codes, codes], axis=0)
        self.scales = jnp.concatenate([self.scales, scales], axis=0)
        self._assign = np.concatenate([self._assign, assign])
        self._n += n_new
        self._pack()
        return np.arange(start, start + n_new, dtype=np.int32)

    def retrain(self, kmeans_iters: int | None = None) -> "IVFFlatIndex":
        """Re-run k-means over everything stored (distribution drift after
        many :meth:`add` calls) and repack. Ids are unchanged."""
        if self._n == 0:
            raise ValueError("nothing stored to retrain on")
        x = dequantize(self.codes, self.scales)
        rng = np.random.default_rng(self.seed + 1)
        c = min(self.n_lists, self._n)
        self.n_lists = c
        init = jnp.asarray(
            rng.choice(self._n, size=c, replace=False).astype(np.int32)
        )
        cent, assign = _kmeans(
            x, init, c, kmeans_iters or self.kmeans_iters
        )
        self.centroids = cent
        self._assign = np.asarray(assign)
        self._pack()
        return self

    def _prep(self, vectors: np.ndarray) -> np.ndarray:
        vectors = np.atleast_2d(np.asarray(vectors, np.float32))
        if vectors.shape[-1] != self.dim:
            raise DimensionMismatch(
                f"index dim {self.dim}, got {vectors.shape[-1]}"
            )
        if self.metric == "cosine":
            vectors = np.asarray(normalize(vectors))
        return vectors

    def _pack(self) -> None:
        """Vectorized repack of codes/scales into padded per-list blocks
        (sorted-by-list, position = (list, within-list rank))."""
        c, n, d = self.n_lists, self._n, self.dim
        order = np.argsort(self._assign, kind="stable")
        srt = self._assign[order]
        counts = np.bincount(srt, minlength=c)
        starts = np.zeros(c + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        within = np.arange(n, dtype=np.int64) - starts[srt]
        lmax = max(1, int(counts.max()))
        bids = np.full((c, lmax), -1, np.int32)
        bids[srt, within] = order.astype(np.int32)
        if self.quantized_blocks:
            blocks = np.zeros((c, lmax, d), np.uint8)
            bsc = np.zeros((c, lmax, 2), np.float32)
            bsc[..., 1] = 1.0  # identity scale on pad rows
            blocks[srt, within] = np.asarray(self.codes)[order]
            bsc[srt, within] = np.asarray(self.scales)[order]
            self.blocks = jnp.asarray(blocks)
            self.bscales = jnp.asarray(bsc)
        else:
            blocks = np.zeros((c, lmax, d), np.float32)
            blocks[srt, within] = np.asarray(
                dequantize(self.codes, self.scales)
            )[order]
            self.blocks = jnp.asarray(blocks)
            self.bscales = None
        self.block_ids = jnp.asarray(bids)

    # -- queries --------------------------------------------------------

    def search(
        self, queries: np.ndarray, k: int, n_probe: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched top-k: (distances [B, k], ids [B, k])."""
        if self.centroids is None:
            raise ValueError("index is untrained: call train_add/add first")
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        if self.metric == "cosine":
            queries = np.asarray(normalize(queries))
        q = dequantize(*quantize(jnp.asarray(queries)))
        p = min(n_probe or self.n_probe, self.n_lists)
        d, i = _ivf_search(
            q, self.centroids, self.blocks, self.bscales, self.block_ids, p, k
        )
        return np.asarray(d), np.asarray(i)

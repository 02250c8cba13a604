"""Sharded HNSW: per-device sub-graphs + distributed top-k merge.

The memory scale-out path (SURVEY.md §2.6 / BASELINE.json configs 4-5):
the collection is partitioned into contiguous shards, each shard builds an
independent HNSW sub-graph over its slice, and a query fans out to every
shard — each device runs the same lockstep beam search on its sub-index,
then per-shard top-k candidates are merged with an ``all_gather`` over the
``shard`` mesh axis and a final (dist, id) sort. Communication rides ICI
collectives; there is no analogue in the reference (single process,
``hnsw/src/template.rs:422-439`` is its entire "communication layer").

Recall note: searching S independent sub-indexes with the same ``ef`` and
merging is at least as accurate as one monolithic index at equal ef — each
shard's exact sub-top-k is a superset restriction — at the cost of S× the
search work per query (amortized by the per-shard size being N/S).

All per-shard state is stacked on a leading ``[S, ...]`` axis sharded over
the mesh's ``shard`` axis, so the same arrays drive both the shard_map'd
query path and (future) fully-sharded wave builds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.hnsw import HNSW
from ..ops.quant import dequantize, quantize
from ..ops.topk import PAD_ID, sort_dist_id
from ..params import Params
from ..search import ann_search
from .mesh import make_mesh


def _local_search(adjs, codes, scales, gids, ep, q, ef, k, max_iters):
    """One shard's search: local beam search, then map local row ids to
    global ids through the shard's owner table."""
    d2, ids = ann_search(adjs, codes, scales, q, ep, ef, k, max_iters)
    safe = jnp.clip(ids, 0, gids.shape[0] - 1)
    gl = jnp.where(ids == PAD_ID, PAD_ID, gids[safe])
    return d2, gl


def sharded_query(mesh, adjs_s, codes_s, scales_s, gids_s, eps_s, q, ef, k, max_iters):
    """Mesh-wide batched query over stacked per-shard state.

    ``adjs_s`` tuple of int32[S, Ns, cap], other per-shard arrays leading
    [S, ...], ``q`` f32[B, d] sharded over ``data``. Each device searches
    its sub-index, then the per-shard top-k merge rides an ``all_gather``
    over the ``shard`` axis + one (dist, id) sort.
    """

    def per_shard(adjs, codes, scales, gids, ep, q):
        adjs = tuple(jax.lax.pvary(a[0], ("data",)) for a in adjs)
        codes, scales, gids, ep = (
            jax.lax.pvary(x, ("data",))
            for x in (codes[0], scales[0], gids[0], ep[0])
        )
        q = jax.lax.pvary(q, ("shard",))
        d2, gl = _local_search(adjs, codes, scales, gids, ep, q, ef, k, max_iters)
        d2_all = jax.lax.all_gather(d2, "shard", axis=1, tiled=True)
        gl_all = jax.lax.all_gather(gl, "shard", axis=1, tiled=True)
        md, mi = sort_dist_id(d2_all, gl_all)
        return md[:, :k], mi[:, :k]

    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            tuple(P("shard") for _ in adjs_s),
            P("shard"), P("shard"), P("shard"), P("shard"),
            P("data"),
        ),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )(adjs_s, codes_s, scales_s, gids_s, eps_s, q)


def sharded_wave_step(
    mesh, adj_s, indeg_s, codes_s, scales_s, ids_w_s, eps_s, *, ef, m, max_iters
):
    """One wave of sharded bulk construction: every shard inserts its wave
    of new points into its local sub-graph concurrently (shard_map over the
    ``shard`` axis) — the multi-chip form of the reference's per-layer
    thread fan-out (``hnsw/src/template.rs:403-440``). Returns the updated
    (adjacency, in-degree) stacks."""
    from ..build import _apply_wave, _wave_layer_step
    from ..search import seed_entry

    def per_shard(adj, indeg, codes, scales, ids_w, ep):
        adj, indeg, codes, scales, ids_w, ep = (
            x[0] for x in (adj, indeg, codes, scales, ids_w, ep)
        )
        safe = jnp.clip(ids_w, 0, codes.shape[0] - 1)
        q = dequantize(codes[safe], scales[safe])
        e_d2, e_ids = seed_entry(codes, scales, q, ep)
        sel_d2, sel_ids = _wave_layer_step(
            adj, codes, scales, ids_w, e_d2, e_ids,
            ef=ef, m=m, max_iters=max_iters,
        )
        new_adj, new_indeg = _apply_wave(
            adj, indeg, codes, scales, ids_w, sel_d2, sel_ids
        )
        return new_adj[None], new_indeg[None]

    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P("shard"),) * 6,
        out_specs=(P("shard"), P("shard")),
        check_vma=False,
    )(adj_s, indeg_s, codes_s, scales_s, ids_w_s, eps_s)


class ShardedHNSW:
    """HNSW over a device mesh: one sub-index per shard."""

    def __init__(
        self,
        m: int,
        dim: int,
        n_shards: int,
        ef_cons: int | None = None,
        mesh: Mesh | None = None,
    ):
        self.params = (
            Params.from_m_efcons(m, ef_cons, dim) if ef_cons else Params.from_m(m, dim)
        )
        self.n_shards = int(n_shards)
        self.mesh = mesh if mesh is not None else make_mesh(1, n_shards)
        self.shards: list[HNSW] = []
        self._stacked = None

    def __len__(self) -> int:
        return sum(len(s) for s in self.shards)

    # -- build -------------------------------------------------------------

    def insert_bulk(self, vectors: np.ndarray, verbose: bool = False) -> "ShardedHNSW":
        """Partition contiguously and build each shard's sub-index (shard
        builds are independent — the reference's thread fan-out
        (template.rs:403-440) becomes embarrassingly parallel sub-builds)."""
        vectors = np.asarray(vectors, np.float32)
        n = vectors.shape[0]
        bounds = np.linspace(0, n, self.n_shards + 1).astype(int)
        self._offsets = bounds[:-1]
        for s in range(self.n_shards):
            sub = HNSW(self.params.m, self.params.ef_cons, self.params.dim)
            sub.insert_bulk(vectors[bounds[s] : bounds[s + 1]], verbose=verbose)
            self.shards.append(sub)
        self._stack()
        return self

    def _stack(self) -> None:
        """Stack per-shard arrays to [S, ...] with uniform padding."""
        S = self.n_shards
        ns = max(len(s) for s in self.shards)
        nl = max(len(s.graph) for s in self.shards)
        d = self.params.dim
        codes = np.zeros((S, ns, d), np.uint8)
        scales = np.zeros((S, ns, 2), np.float32)
        gids = np.full((S, ns), -1, np.int32)
        eps = np.zeros((S,), np.int32)
        adjs = [
            np.full((S, ns, self.params.layer_cap(l)), -1, np.int32)
            for l in range(nl)
        ]
        for s, sub in enumerate(self.shards):
            k = len(sub)
            codes[s, :k] = np.asarray(sub.points.codes)
            scales[s, :k] = np.asarray(sub.points.scales)
            gids[s, :k] = self._offsets[s] + np.arange(k)
            eps[s] = sub.params.ep
            for l in range(len(sub.graph)):
                adjs[l][s, :k] = np.asarray(sub.graph.get_layer(l))
        shard = NamedSharding(self.mesh, P("shard"))
        dev = lambda x: jax.device_put(jnp.asarray(x), shard)
        self._stacked = {
            "codes": dev(codes),
            "scales": dev(scales),
            "gids": dev(gids),
            "eps": dev(eps),
            "adjs": tuple(dev(a) for a in adjs),
        }

    # -- query -------------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self", "ef", "k", "max_iters"))
    def _sharded_query(self, q, ef, k, max_iters):
        st = self._stacked
        return sharded_query(
            self.mesh, st["adjs"], st["codes"], st["scales"], st["gids"],
            st["eps"], q, ef, k, max_iters,
        )

    def ann_batch(
        self, queries: np.ndarray, n: int, ef: int, max_iters: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched sharded query: returns (distances [B, n], ids [B, n])
        with global ids."""
        queries = np.atleast_2d(np.asarray(queries, np.float32))
        ef = max(ef, n)
        if max_iters is None:
            max_iters = 2 * ef + 16
        qc, qs = quantize(jnp.asarray(queries))
        q = dequantize(qc, qs)
        q = jax.device_put(q, NamedSharding(self.mesh, P("data")))
        d, i = self._sharded_query(q, ef, n, max_iters)
        return np.asarray(d), np.asarray(i)

    # hashing for jit static self: identity-based is fine (stacked arrays
    # are rebuilt into a fresh object per build)
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

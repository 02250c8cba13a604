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
        vary = lambda x, ax: jax.lax.pcast(x, ax, to="varying")
        adjs = tuple(vary(a[0], ("data",)) for a in adjs)
        codes, scales, gids, ep = (
            vary(x, ("data",))
            for x in (codes[0], scales[0], gids[0], ep[0])
        )
        q = vary(q, ("shard",))
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
    mesh, adjs_s, indegs_s, codes_s, scales_s, ids_w_s, eps_s,
    *, ef, m, max_iters, layer_nb=0, extend_cands=True,
):
    """One wave of sharded bulk construction: every shard runs the FULL
    fused insertion wave (greedy descent above the home layer, per-layer
    beam search + heuristic + edge apply — ``build._insert_wave_fused``)
    on its local sub-graph concurrently, via shard_map over the ``shard``
    axis — the multi-chip form of the reference's per-layer thread fan-out
    (``hnsw/src/template.rs:403-440``).

    ``adjs_s``/``indegs_s``: tuples (layer 0 first) of [S, Ns, cap_l] /
    [S, Ns] stacks. Returns the updated stacks.
    """
    from ..build import _insert_wave_fused_impl

    def per_shard(adjs, indegs, codes, scales, ids_w, ep):
        adjs = tuple(a[0] for a in adjs)
        indegs = tuple(d[0] for d in indegs)
        codes, scales, ids_w, ep = (
            x[0] for x in (codes, scales, ids_w, ep)
        )
        new_adjs, new_indegs = _insert_wave_fused_impl(
            adjs, indegs, codes, scales, ids_w, ep,
            ef=ef, m=m, max_iters=max_iters, layer_nb=layer_nb,
            extend_cands=extend_cands,
        )
        return (
            tuple(a[None] for a in new_adjs),
            tuple(d[None] for d in new_indegs),
        )

    nl = len(adjs_s)
    return jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(
            (P("shard"),) * nl, (P("shard"),) * nl,
            P("shard"), P("shard"), P("shard"), P("shard"),
        ),
        out_specs=((P("shard"),) * nl, (P("shard"),) * nl),
        check_vma=False,
    )(adjs_s, indegs_s, codes_s, scales_s, ids_w_s, eps_s)


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
        if self._stacked is not None:
            return int(np.sum(np.asarray(self._stacked["gids"]) >= 0))
        return sum(len(s) for s in self.shards)

    # -- build -------------------------------------------------------------

    def insert_bulk(
        self, vectors: np.ndarray, verbose: bool = False, concurrent: bool = True
    ) -> "ShardedHNSW":
        """Partition contiguously and build every shard's sub-index.

        ``concurrent=True`` (default): all shards build **simultaneously**
        — each wave is one shard_map'd fused insert step running on every
        device at once (the multi-chip analogue of the reference's thread
        fan-out, ``template.rs:403-440``). ``concurrent=False`` builds the
        shards one by one with the host builder (cross-check path).

        Calling this on an already-built object REPLACES the index with a
        fresh build over ``vectors``.
        """
        vectors = np.asarray(vectors, np.float32)
        self.shards = []
        self._stacked = None
        n = vectors.shape[0]
        bounds = np.linspace(0, n, self.n_shards + 1).astype(int)
        self._offsets = bounds[:-1]
        if not concurrent:
            for s in range(self.n_shards):
                sub = HNSW(self.params.m, self.params.ef_cons, self.params.dim)
                sub.insert_bulk(vectors[bounds[s] : bounds[s + 1]], verbose=verbose)
                self.shards.append(sub)
            self._stack()
            return self
        self._build_concurrent(vectors, bounds)
        return self

    def _build_concurrent(self, vectors: np.ndarray, bounds: np.ndarray) -> None:
        """Shard-parallel wave build over the mesh."""
        import functools

        from ..build import _bucket, wave_schedule
        from ..ops.quant import quantize as _q
        from ..store import sample_levels

        S = self.n_shards
        p = self.params
        ns = int(max(bounds[s + 1] - bounds[s] for s in range(S)))
        d = p.dim
        codes = np.zeros((S, ns, d), np.uint8)
        scales = np.zeros((S, ns, 2), np.float32)
        levels = np.full((S, ns), -1, np.int32)
        gids = np.full((S, ns), -1, np.int32)
        eps = np.zeros((S,), np.int32)
        for s in range(S):
            k = int(bounds[s + 1] - bounds[s])
            c, sc = _q(jnp.asarray(vectors[bounds[s] : bounds[s + 1]]))
            codes[s, :k] = np.asarray(c)
            scales[s, :k] = np.asarray(sc)
            lv = sample_levels(k, p.ml, seed=s)
            levels[s, :k] = lv
            gids[s, :k] = self._offsets[s] + np.arange(k)
            eps[s] = int(np.flatnonzero(lv == lv.max())[0]) if k else 0
        top = int(levels.max())
        shard = NamedSharding(self.mesh, P("shard"))
        dev = lambda x: jax.device_put(jnp.asarray(x), shard)
        codes_d, scales_d = dev(codes), dev(scales)
        eps_d = dev(eps)
        adjs = tuple(
            dev(np.full((S, ns, p.layer_cap(l)), -1, np.int32))
            for l in range(top + 1)
        )
        indegs = tuple(dev(np.zeros((S, ns), np.int32)) for _ in range(top + 1))

        step = jax.jit(
            functools.partial(sharded_wave_step, self.mesh),
            static_argnames=("ef", "m", "max_iters", "layer_nb", "extend_cands"),
        )
        max_iters = 2 * p.ef_cons + 16
        for layer_nb in range(top, -1, -1):
            homes = [
                np.flatnonzero(levels[s] == layer_nb).astype(np.int32)
                for s in range(S)
            ]
            maxhome = max((h.size for h in homes), default=0)
            if maxhome == 0:
                continue
            offs = [0] * S
            for wsize in wave_schedule(maxhome):
                wpad = _bucket(wsize)
                ids_w = np.full((S, wpad), -1, np.int32)
                for s in range(S):
                    take = homes[s][offs[s] : offs[s] + wsize]
                    ids_w[s, : take.size] = take
                    offs[s] += wsize
                adjs, indegs = step(
                    adjs, indegs, codes_d, scales_d, dev(ids_w), eps_d,
                    ef=p.ef_cons, m=p.m, max_iters=max_iters,
                    layer_nb=layer_nb, extend_cands=p.extend_cands,
                )
        self._stacked = {
            "codes": codes_d,
            "scales": scales_d,
            "gids": dev(gids),
            "eps": eps_d,
            "adjs": adjs,
        }

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
        # index arrays are passed as jit ARGUMENTS (not via a static self)
        # so a rebuild on the same object never serves a stale executable
        st = self._stacked
        d, i = _sharded_query_jit(
            self.mesh, st["adjs"], st["codes"], st["scales"], st["gids"],
            st["eps"], q, ef=ef, k=n, max_iters=max_iters,
        )
        return np.asarray(d), np.asarray(i)


_sharded_query_jit = functools.partial(
    jax.jit, static_argnums=(0,), static_argnames=("ef", "k", "max_iters")
)(sharded_query)

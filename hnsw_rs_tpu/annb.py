"""ann-benchmarks adapter: plug this framework into the standard
https://github.com/erikbern/ann-benchmarks harness for apples-to-apples
recall/QPS curves against hnswlib / faiss / the Rust reference.

The harness instantiates an algorithm class with constructor kwargs from
its YAML config, then drives the ``BaseANN`` protocol: ``fit(X)`` →
``set_query_arguments(ef)`` → ``query``/``batch_query``. No import of the
``ann_benchmarks`` package is required here (the protocol is duck-typed),
so this module works standalone too — e.g. for a local sweep:

    algo = ANNBenchmarksHNSW("angular", {"M": 16, "efConstruction": 96})
    algo.fit(train)
    algo.set_query_arguments(64)
    algo.batch_query(test, 10)
    ids = algo.get_batch_results()

Config stanza for the harness (module: hnsw_rs_tpu.annb):

    hnsw-rs-tpu:
      constructor: ANNBenchmarksHNSW
      module: hnsw_rs_tpu.annb
      run-groups:
        M-16:
          arg-groups: [{"M": 16, "efConstruction": 96}]
          query-args: [[16, 32, 64, 128, 256]]

The reference evaluates the same protocol by hand in its eval binary
(``hnsw/src/main.rs`` / ``helpers/glove.rs:73-109``: brute-force truth +
recall over a query split); this adapter exposes ours to the shared
harness instead of a private loop.

CAVEAT: this adapter has never met the real ann-benchmarks harness (the
package cannot be installed here — no egress); the protocol is duck-typed
from its BaseANN source and pinned by fixture tests (tests/test_annb.py)
only. Treat the first run under the actual harness as integration, not
regression.
"""

from __future__ import annotations

import numpy as np


def _resolve_metric(metric: str) -> str:
    m = {"angular": "cosine", "cosine": "cosine", "euclidean": "l2", "l2": "l2"}
    try:
        return m[metric]
    except KeyError:
        raise ValueError(f"unsupported metric {metric!r}") from None


class _Base:
    """Shared BaseANN plumbing (batch result stash, lifecycle no-ops)."""

    name = "hnsw_rs_tpu"

    def __init__(self) -> None:
        self._batch_ids: np.ndarray | None = None

    def done(self) -> None:  # harness lifecycle hook
        pass

    def get_batch_results(self) -> np.ndarray:
        assert self._batch_ids is not None, "call batch_query first"
        return self._batch_ids

    def get_additional(self) -> dict:
        return {}

    def __str__(self) -> str:
        return self.name


class ANNBenchmarksHNSW(_Base):
    """HNSW under the ann-benchmarks protocol. Constructor args follow
    the harness's hnswlib conventions: ``M``, ``efConstruction``; query
    argument is ``ef``."""

    def __init__(self, metric: str, method_param: dict | None = None, **kw):
        super().__init__()
        p = dict(method_param or {})
        p.update(kw)
        self._m = int(p.get("M", p.get("m", 16)))
        self._ef_cons = int(p.get("efConstruction", p.get("ef_cons", 2 * self._m)))
        self._metric = _resolve_metric(metric)
        self._ef = 64
        self._index = None
        self.name = f"hnsw_rs_tpu(M={self._m}, efC={self._ef_cons})"

    def fit(self, X: np.ndarray) -> None:
        from .models.hnsw import HNSW

        X = np.asarray(X, np.float32)
        self._index = HNSW(
            self._m, ef_cons=self._ef_cons, dim=X.shape[1], metric=self._metric
        )
        self._index.insert_bulk(X)
        self._index.finalize()

    def set_query_arguments(self, ef: int) -> None:
        self._ef = max(int(ef), 1)

    def query(self, q: np.ndarray, n: int) -> np.ndarray:
        return self._index.ann_by_vector(np.asarray(q, np.float32), n, self._ef)

    def batch_query(self, X: np.ndarray, n: int) -> None:
        _, ids = self._index.ann_batch(
            np.asarray(X, np.float32), n, max(self._ef, n)
        )
        self._batch_ids = ids

    def get_memory_usage(self) -> int | None:
        if self._index is None:
            return None
        idx = self._index
        n = len(idx)
        pts = idx.points
        d = max(idx.params.dim, 1)
        # live rows only (the store capacity-pads), plus every serving
        # layout fit() built: the packed layer-0 rows DOMINATE (~cap*(d+12)
        # bytes/point, ~13x the raw codes) and must be reported, or the
        # harness's memory column understates by an order of magnitude
        total = n * d + n * 8  # codes u8 + scales 2xf32
        for adj in idx.graph.adjs:
            total += n * adj.shape[1] * 4
        if idx._packed0 is not None:
            total += idx._packed0.size
        if idx._pivots is not None:
            total += idx._pivots[1].size * 4 + idx._pivots[0].size * 4
        if idx._f32_table is not None:
            total += n * d * 4
        if idx._pq is not None:
            cb, pq_codes, packed_pq, rot = idx._pq
            total += packed_pq.size + pq_codes.size + cb.size * 4
            if rot is not None:
                total += rot.size * 4
        return total // 1024  # harness expects kB


class ANNBenchmarksFlat(_Base):
    """Exact-search baseline under the same protocol (recall == 1)."""

    def __init__(self, metric: str, method_param: dict | None = None, **kw):
        super().__init__()
        self._metric = _resolve_metric(metric)
        self._index = None
        self.name = "hnsw_rs_tpu_flat"

    def fit(self, X: np.ndarray) -> None:
        from .models.flat import FlatIndex

        X = np.asarray(X, np.float32)
        self._index = FlatIndex(X.shape[1], metric=self._metric)
        self._index.add(X)

    def set_query_arguments(self, *args) -> None:
        pass

    def query(self, q: np.ndarray, n: int) -> np.ndarray:
        return self._index.search(np.asarray(q, np.float32)[None], n)[1][0]

    def batch_query(self, X: np.ndarray, n: int) -> None:
        self._batch_ids = self._index.search(np.asarray(X, np.float32), n)[1]


class ANNBenchmarksIVF(_Base):
    """IVF-Flat under the protocol: constructor ``n_list``, query
    argument ``n_probe`` (faiss-ivf conventions)."""

    def __init__(self, metric: str, method_param: dict | None = None, **kw):
        super().__init__()
        p = dict(method_param or {})
        p.update(kw)
        self._n_lists = int(p.get("n_list", p.get("n_lists", 0)))
        self._metric = _resolve_metric(metric)
        self._n_probe = 8
        self._index = None
        self.name = f"hnsw_rs_tpu_ivf(n_list={self._n_lists})"

    def fit(self, X: np.ndarray) -> None:
        from .models.ivf import IVFFlatIndex

        X = np.asarray(X, np.float32)
        self._index = IVFFlatIndex(
            X.shape[1], n_lists=self._n_lists, metric=self._metric
        )
        self._index.train_add(X)

    def set_query_arguments(self, n_probe: int) -> None:
        self._n_probe = max(int(n_probe), 1)

    def query(self, q: np.ndarray, n: int) -> np.ndarray:
        return self._index.search(np.asarray(q, np.float32)[None], n, self._n_probe)[1][0]

    def batch_query(self, X: np.ndarray, n: int) -> None:
        self._batch_ids = self._index.search(
            np.asarray(X, np.float32), n, self._n_probe
        )[1]

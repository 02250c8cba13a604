"""hnsw_rs_tpu — a TPU-native HNSW approximate-nearest-neighbor engine.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference Rust workspace (Gumo-A/hnsw_rs): quantized vector storage, HNSW
index construction (bulk + incremental), batched greedy-beam queries,
persistence, and GloVe evaluation — redesigned for TPU hardware (dense
adjacency arrays in HBM, lockstep batched traversal, MXU distance kernels,
mesh-sharded scale-out) rather than ported.

Layer map (mirrors SURVEY.md §1):
- ``ops``      — numeric kernels (the ``vectors`` crate analogue)
- ``graphs``   — layered dense adjacency (the ``graph`` crate analogue)
- ``store``    — quantized point storage (the ``points`` crate analogue)
- ``models``   — index algorithms: ``HNSW``, ``FlatIndex`` (the ``hnsw`` crate)
- ``parallel`` — mesh sharding: query DP + sharded sub-indexes
- ``utils``    — datasets, progress, CLI, serialization (``helpers`` +
  ``eval_glove`` analogues)
"""

from .params import Params, get_default_ml
from .store import PointStore
from .models.flat import FlatIndex
from .models.ivf import IVFFlatIndex

__version__ = "0.1.0"

__all__ = [
    "Params",
    "get_default_ml",
    "PointStore",
    "FlatIndex",
    "IVFFlatIndex",
    "HNSW",
    "__version__",
]


def __getattr__(name):
    if name == "HNSW":
        from .models.hnsw import HNSW

        return HNSW
    raise AttributeError(name)

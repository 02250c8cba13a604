"""Host-side utilities: dataset loading, ground truth, progress, CLI args,
serialization."""

from .glove import brute_force_nns, load_glove_array
from .progress import ProgressBar, progress_iter
from .rand import gen_rand_vecs

__all__ = [
    "brute_force_nns",
    "load_glove_array",
    "ProgressBar",
    "progress_iter",
    "gen_rand_vecs",
]

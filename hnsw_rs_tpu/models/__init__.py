"""Index model families: exact flat search (MXU brute force), the HNSW
graph index, and IVF-Flat (inverted file, the TPU-native block design)."""

from .flat import FlatIndex
from .ivf import IVFFlatIndex

__all__ = ["FlatIndex", "HNSW", "IVFFlatIndex"]


def __getattr__(name):
    if name == "HNSW":
        from .hnsw import HNSW

        return HNSW
    raise AttributeError(name)

from tpufm.index.builder import build_index, KStepFMIndex
from tpufm.index.store import load_store, save_store
from tpufm.index.suffix_array import suffix_array

__all__ = [
    "build_index",
    "KStepFMIndex",
    "load_store",
    "save_store",
    "suffix_array",
]

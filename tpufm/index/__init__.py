from tpufm.index.builder import build_index, KStepFMIndex
from tpufm.index.suffix_array import suffix_array

__all__ = ["build_index", "KStepFMIndex", "suffix_array"]

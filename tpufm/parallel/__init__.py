from tpufm.parallel.mesh import initialize_distributed, make_mesh
from tpufm.parallel.search import DataParallelEngine, ShardedIndexEngine
from tpufm.parallel.locate import DataParallelLocate, DataParallelSearchLocate
from tpufm.parallel.traffic import assert_collective_model, collective_bytes_model

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "DataParallelEngine",
    "ShardedIndexEngine",
    "DataParallelLocate",
    "DataParallelSearchLocate",
    "assert_collective_model",
    "collective_bytes_model",
]

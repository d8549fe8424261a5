from tpufm.parallel.mesh import make_mesh
from tpufm.parallel.search import DataParallelEngine, ShardedIndexEngine

__all__ = ["make_mesh", "DataParallelEngine", "ShardedIndexEngine"]

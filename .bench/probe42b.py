import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, time
from tpufm.config import IndexConfig
from tpufm.index.builder_device import build_index_device
rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=250_000_000, dtype=np.uint8)
t0 = time.perf_counter()
idx = build_index_device(codes, IndexConfig(k=3, d=192), return_host=False)
import jax as j; j.block_until_ready
# force completion with a host fetch of one element
_ = np.asarray(j.device_get(idx.occ[0, :1]))
print(f"250M device build (warm cache): {time.perf_counter()-t0:.1f}s", flush=True)

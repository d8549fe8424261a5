import sys
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from tpufm import build_index, IndexConfig
from tpufm.engine.xla import XLAEngine
from tpufm.io.genreads import generate_reads
from tpufm.utils.timer import timed_device_passes

rng = np.random.default_rng(0)
B = 2**20
codes = rng.integers(0, 4, size=10_000_000, dtype=np.uint8)
q = generate_reads(codes, 120, B, seed=7)
qd = jax.device_put(jnp.asarray(q, jnp.uint8))
for d in (96, 160):
    index = build_index(codes, IndexConfig(k=3, d=d))
    eng = XLAEngine(index, lut_m=12)
    mean_s, min_s = timed_device_passes(lambda: eng.search_device(qd), iterations=3)
    print(f"10M d={d:3d} 1M wave lut12: {min_s:.3f}s  reads/s={B/min_s:10,.0f}", flush=True)
    del eng, index

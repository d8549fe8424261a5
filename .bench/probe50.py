"""probe50: valley (40 Mbase) wave-size sweep — does a bigger wave flip it?"""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from tpufm.config import IndexConfig
from tpufm.engine.xla import XLAEngine
from tpufm.index.builder import build_index
from tpufm.io.genreads import generate_reads
from tpufm.utils.timer import timed_device_passes

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=40_000_000, dtype=np.uint8)
index = build_index(codes, IndexConfig(k=3, d=128))
eng = XLAEngine(index, lut_m=12)
for B in (1 << 19, 1 << 20, 1 << 20 | 1 << 19, 1 << 21):
    queries = generate_reads(codes, 120, B, seed=1)
    qd = jax.device_put(jnp.asarray(queries, jnp.uint8))
    dt, _ = timed_device_passes(lambda: eng.search_device(qd), iterations=3)
    print(f"valley wave {B>>10}K: {B/dt/1e3:8.1f}K reads/s", flush=True)
    del qd

"""Probe 15: why is k=3 d=128 so fast? Sweep d further, test row padding,
and test whether the win survives a 2x bigger reference (table size)."""
import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)

def sync(x):
    return np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:8]))

def timed_call(f, *a, it=3):
    out = f(*a); sync(out)
    ts = []
    for _ in range(it):
        t0 = time.perf_counter()
        out = f(*a); sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)

from tpufm import build_index, IndexConfig
from tpufm.engine.xla import XLAEngine
from tpufm.io.genreads import generate_reads

L, NB = 120, 2**19

for N in (10_000_000, 40_000_000):
    codes = rng.integers(0, 4, size=N, dtype=np.uint8)
    q = generate_reads(codes, L, NB, seed=7)
    qd = jax.device_put(jnp.asarray(q, jnp.uint8))
    for k, d in [(3, 128), (3, 192), (3, 256), (2, 256), (4, 256), (2, 128)]:
        index = build_index(codes, IndexConfig(k=k, d=d))
        eng = XLAEngine(index, layout="fused")
        E, W = eng.tables["entries"].shape
        dt = timed_call(lambda x: eng.search_device(x), qd)
        print(f"N={N//1_000_000}M k={k} d={d:3d} (E={E:7d}, row {W*4:5d} B, tab {E*W*4/1e6:6.1f} MB): {dt*1e3:8.1f} ms  reads/s={NB/dt:10,.0f}", flush=True)
        del eng, index

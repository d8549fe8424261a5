"""Probe 12: does read duplication inflate engine throughput?
Engine k=3 fused, 512K reads: (a) 2048 distinct reads x256, (b) all distinct.
Also: synthetic chain with [B,2]-shaped duplicate-pair indices vs flat."""
import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
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

N, L, NB = 10_000_000, 120, 2**19
codes = rng.integers(0, 4, size=N, dtype=np.uint8)
index = build_index(codes, IndexConfig(k=3, d=64))
eng = XLAEngine(index, layout="fused")

starts = rng.integers(0, N - L, size=2048)
qs = np.stack([codes[s:s + L] for s in starts])
q_dup = np.concatenate([qs] * (NB // 2048))[:NB]
q_dis = generate_reads(codes, L, NB, seed=7)

for name, q in [("2048x256 dup", q_dup), ("all distinct", q_dis)]:
    qd = jax.device_put(jnp.asarray(q, jnp.uint8))
    dt = timed_call(lambda x: eng.search_device(x), qd)
    print(f"k=3 fused, {name}: {dt*1e3:8.1f} ms  reads/s={NB/dt:10,.0f}", flush=True)

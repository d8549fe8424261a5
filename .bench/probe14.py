"""Probe 14: honest end-to-end engine sweep over (k, d), fused layout,
512K distinct reads x 120 bp, 10 Mbase reference."""
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
from tpufm.engine.oracle import search_oracle
from tpufm.io.genreads import generate_reads

N, L, NB = 10_000_000, 120, 2**19
codes = rng.integers(0, 4, size=N, dtype=np.uint8)
q = generate_reads(codes, L, NB, seed=7)
qd = jax.device_put(jnp.asarray(q, jnp.uint8))

for k, d in [(1, 64), (2, 64), (2, 128), (3, 64), (3, 128), (4, 64), (4, 128), (2, 32), (3, 32)]:
    t0 = time.perf_counter()
    index = build_index(codes, IndexConfig(k=k, d=d))
    bs = time.perf_counter() - t0
    try:
        eng = XLAEngine(index, layout="fused")
        dt = timed_call(lambda x: eng.search_device(x), qd)
        got = np.asarray(jax.device_get(eng.search_device(qd)))[:128]
        ok = (got == search_oracle(index, q[:128])).all()
        W = index.config.k * 2 * (d // 32) + 4**k
        print(f"k={k} d={d:3d} (row {W*4:5d} B, build {bs:5.1f}s): {dt*1e3:8.1f} ms  reads/s={NB/dt:10,.0f}  exact={ok}", flush=True)
    except Exception as e:
        print(f"k={k} d={d}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

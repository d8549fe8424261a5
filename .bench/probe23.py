"""Probe 23 (honest timing): PallasEngine vs XLAEngine on a real 10 Mbase
index, k=3 d=128 — re-check the old 'Pallas DMA 4x slower' claim; and the
flagship config with LUT m=12 on a real index (the bench configuration)."""
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
index = build_index(codes, IndexConfig(k=3, d=128))

# flagship: fused + LUT m=12
t0 = time.perf_counter()
eng = XLAEngine(index, lut_m=12)
print(f"engine+LUT init: {time.perf_counter()-t0:.1f}s", flush=True)
dt = timed_call(lambda x: eng.search_device(x), qd)
got = np.asarray(jax.device_get(eng.search_device(qd)))[:128]
ok = (got == search_oracle(index, q[:128])).all()
print(f"k=3 d=128 fused+lut12: {dt*1e3:8.1f} ms  reads/s={NB/dt:10,.0f}  exact={ok}", flush=True)

# no LUT for comparison
eng0 = XLAEngine(index)
dt = timed_call(lambda x: eng0.search_device(x), qd)
print(f"k=3 d=128 fused      : {dt*1e3:8.1f} ms  reads/s={NB/dt:10,.0f}", flush=True)

# Pallas engine (honest re-measure)
try:
    from tpufm.engine.pallas_kernel import PallasEngine
    pe = PallasEngine(index, tile=2048)
    dt = timed_call(lambda x: pe.search_device(x), qd)
    pg = np.asarray(jax.device_get(pe.search_device(qd)))[:128]
    pok = (pg == search_oracle(index, q[:128])).all()
    print(f"pallas k=3 d=128     : {dt*1e3:8.1f} ms  reads/s={NB/dt:10,.0f}  exact={pok}", flush=True)
except Exception as e:
    print(f"pallas FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

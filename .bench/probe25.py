"""Probe 25: PallasEngine vs XLAEngine at genome-scale E (fake index,
E=2.6M, k=3 d=192) — does the Pallas round body flip the XLA gather to the
fast path where the jnp round body lands on the slow one?"""
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

from tpufm.config import IndexConfig
from tpufm.index.builder import KStepFMIndex
from tpufm.engine.xla import XLAEngine
from tpufm.engine.pallas_kernel import PallasEngine

B, L, k, d, E = 2**19, 120, 3, 192, 2_604_167
bwtsize = E * d - 7
cfg = IndexConfig(k=k, d=d)
occ = rng.integers(0, bwtsize - d, size=(E + 1, 64), dtype=np.uint32)
bitmaps = rng.integers(0, 2**32, size=(E + 1, k, 2, d // 32), dtype=np.uint32)
fake = KStepFMIndex(config=cfg, bwtsize=bwtsize, occ=occ, bitmaps=bitmaps,
                    dollar_pos=np.zeros(k, np.uint32), dollar_base=np.full(k, 3, np.uint32))
q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))

pe = PallasEngine(fake, tile=2048)
dt = timed_call(lambda x: pe.search_device(x), q)
print(f"pallas k=3 d=192 E=2.6M: {dt*1e3:8.1f} ms  reads/s={B/dt:10,.0f}", flush=True)
del pe

xe = XLAEngine(fake)
dt = timed_call(lambda x: xe.search_device(x), q)
print(f"xla    k=3 d=192 E=2.6M: {dt*1e3:8.1f} ms  reads/s={B/dt:10,.0f}", flush=True)

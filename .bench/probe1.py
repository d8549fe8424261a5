import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
print("devices:", jax.devices())

from tpufm import build_index, IndexConfig
from tpufm.engine.xla import XLAEngine

rng = np.random.default_rng(0)
N = 10_000_000
codes = rng.integers(0, 4, size=N, dtype=np.uint8)
t0=time.time()
index = build_index(codes, IndexConfig(k=2, d=64))
print(f"build: {time.time()-t0:.1f}s entries={index.nentries}")

B, L = 131072, 120
starts = rng.integers(0, N - L, size=B)
q = np.stack([codes[s:s+L] for s in starts[:1024]])
q = np.concatenate([q] * (B // 1024))[:B]
eng = XLAEngine(index)
qd = jax.device_put(jnp.asarray(q, jnp.uint8))
t0=time.time(); out = eng.search_device(qd); out.block_until_ready(); print(f"compile+first: {time.time()-t0:.1f}s")
for _ in range(3):
    t0=time.time(); out = eng.search_device(qd); out.block_until_ready()
    dt = time.time()-t0
rounds = L // 2
steps = B * rounds
print(f"search: {dt*1000:.1f} ms  reads/s={B/dt:,.0f}  ksteps/s={steps/dt:,.0f}  ends*rounds/s={2*steps/dt:,.0f}")
# bytes/round/end: occ row gather currently gathers occ[block, code] scalar? No: occ[block, code] 2D adv idx -> 4B; bitmaps row 32B
gb = 2*steps * (4 + 32) / dt / 1e9
print(f"approx gathered GB/s: {gb:.1f}")

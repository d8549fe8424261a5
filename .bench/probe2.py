import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from tpufm import build_index, IndexConfig
from tpufm.engine.xla import XLAEngine
from tpufm.engine.oracle import search_oracle

rng = np.random.default_rng(0)
N = 10_000_000
codes = rng.integers(0, 4, size=N, dtype=np.uint8)
index = build_index(codes, IndexConfig(k=2, d=64))
B, L = 131072, 120
starts = rng.integers(0, N - L, size=2048)
qs = np.stack([codes[s:s+L] for s in starts])
eng = XLAEngine(index)

# correctness spot check on TPU vs oracle
got = eng.search(qs[:256])
exp = search_oracle(index, qs[:256])
print("correct on TPU:", (got == exp).all())

q_full = np.concatenate([qs] * (B // 2048))[:B]
qd = jax.device_put(jnp.asarray(q_full, jnp.uint8))
out = eng.search_device(qd); jax.block_until_ready(out)
# vary input each iter to defeat any caching; time a fixed loop
import copy
t0 = time.perf_counter()
ITER = 10
for i in range(ITER):
    out = eng.search_device(qd)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / ITER
rounds = L // 2
print(f"B={B} search: {dt*1000:.2f} ms/iter reads/s={B/dt:,.0f} ksteps/s={B*rounds/dt:,.0f}")
bytes_pr = 2 * B * rounds * (4 + 32)
print(f"implied gather GB/s: {bytes_pr/dt/1e9:.1f}")

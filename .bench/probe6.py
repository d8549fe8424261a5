import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tpufm import build_index, IndexConfig
from tpufm.engine.xla import XLAEngine
from tpufm.engine.oracle import search_oracle

rng = np.random.default_rng(0)
N = 10_000_000
codes = rng.integers(0, 4, size=N, dtype=np.uint8)
L, B = 120, 2**19
starts = rng.integers(0, N - L, size=2048)
qs = np.stack([codes[s:s+L] for s in starts])
q = np.concatenate([qs] * (B // 2048))[:B]

for k, d in [(3, 64), (2, 128)]:
    index = build_index(codes, IndexConfig(k=k, d=d))
    eng = XLAEngine(index)
    qd = jax.device_put(jnp.asarray(q, jnp.uint8))
    t0 = time.perf_counter(); out = eng.search_device(qd); jax.block_until_ready(out)
    print(f"k={k} d={d}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    got = np.asarray(jax.device_get(out))[:256]
    exp = search_oracle(index, q[:256])
    print(f"  exact: {(got==exp).all()}", flush=True)
    it = 5
    t0 = time.perf_counter()
    for _ in range(it): out = eng.search_device(qd)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0)/it
    rounds = L // k
    print(f"  {dt*1e3:.1f} ms  reads/s={B/dt:,.0f}  rounds/s={B*rounds/dt/1e6:.1f}M  gathers/s={2*B*rounds/dt/1e6:.1f}M", flush=True)

import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tpufm import build_index, IndexConfig
from tpufm.engine.pallas_kernel import PallasEngine
from tpufm.engine.oracle import search_oracle

rng = np.random.default_rng(0)
N = 10_000_000
codes = rng.integers(0, 4, size=N, dtype=np.uint8)
L, B = 120, 2**19
starts = rng.integers(0, N - L, size=2048)
qs = np.stack([codes[s:s+L] for s in starts])
q = np.concatenate([qs] * (B // 2048))[:B]

for k, d in [(3, 64), (2, 64)]:
    index = build_index(codes, IndexConfig(k=k, d=d))
    eng = PallasEngine(index, tile=2048)
    qd = jax.device_put(jnp.asarray(q, jnp.uint8))
    t0 = time.perf_counter()
    try:
        out = eng.search_device(qd); jax.block_until_ready(out)
    except Exception as e:
        print(f"k={k} d={d} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True); continue
    print(f"k={k} d={d}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    got = np.asarray(jax.device_get(out))[:256]
    print(f"  exact: {(got==search_oracle(index, q[:256])).all()}", flush=True)
    it = 5
    t0 = time.perf_counter()
    for _ in range(it): out = eng.search_device(qd)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0)/it
    print(f"  {dt*1e3:.1f} ms  reads/s={B/dt:,.0f}", flush=True)

import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, time, jax.numpy as jnp
from tpufm.index import sa_device
initial, step = sa_device._build_steps()
rng = np.random.default_rng(0)
n = 64_000_000
codes = rng.integers(0, 4, size=n, dtype=np.uint8)
cd = jax.device_put(jnp.asarray(codes))
print(f"put done {time.strftime('%T')}", flush=True)
t0 = time.perf_counter()
rank, order, distinct = initial(cd)
d = bool(jax.device_get(distinct))
print(f"initial {time.perf_counter()-t0:.1f}s distinct={d}", flush=True)
h = 10
while not d and h < n + 1:
    t0 = time.perf_counter()
    rank, order, distinct = step(rank, jnp.uint32(h))
    d = bool(jax.device_get(distinct))
    print(f"h={h}: {time.perf_counter()-t0:.2f}s distinct={d}", flush=True)
    h *= 2
t0 = time.perf_counter()
sa = np.asarray(jax.device_get(order), dtype=np.int64)
print(f"fetch {time.perf_counter()-t0:.1f}s", flush=True)

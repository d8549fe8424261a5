import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, time, jax.numpy as jnp
from tpufm.index import sa_device
sa_device._steps = None
initial, step = sa_device._build_steps()

rng = np.random.default_rng(0)
for n in (1_000_000, 4_000_000, 16_000_000):
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    cd = jax.device_put(jnp.asarray(codes))
    t0 = time.perf_counter()
    rank, order, distinct = initial(cd)
    d = bool(jax.device_get(distinct))
    print(f"n={n}: initial {time.perf_counter()-t0:.2f}s distinct={d}", flush=True)
    h = 10
    while not d and h < n + 1:
        t0 = time.perf_counter()
        rank, order, distinct = step(rank, jnp.uint32(h))
        d = bool(jax.device_get(distinct))
        print(f"  h={h}: {time.perf_counter()-t0:.2f}s distinct={d}", flush=True)
        h *= 2

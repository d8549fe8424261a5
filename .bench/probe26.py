"""Probe 26: fast-path boundary in E at d=128, and other d values (96, 160)
— real engine fn on fake tables (validated harness from probe17)."""
import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tpufm.engine.xla import make_search_fn
rng = np.random.default_rng(0)
B, L = 2**19, 120
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
q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
def run(k, d, E):
    nb = d // 32
    W = 2 * k * nb + 4**k
    bwtsize = E * d - 7
    ent = rng.integers(0, 2**32, size=(E + 1, W), dtype=np.uint32)
    ent[:, 2 * k * nb:] = rng.integers(0, bwtsize - d, size=(E + 1, 4**k), dtype=np.uint32)
    tables = {"entries": jax.device_put(jnp.asarray(ent)),
              "dollar_pos": jnp.zeros(k, jnp.uint32),
              "dollar_base": jnp.full(k, 3, jnp.uint32),
              "dollar_block": jnp.zeros(k, jnp.uint32)}
    fn = jax.jit(make_search_fn(k, d, False, layout="fused"))
    dt = timed_call(fn, tables, jnp.uint32(bwtsize), q)
    print(f"k={k} d={d:3d} E={E:9,d}: {dt*1e3:8.1f} ms  reads/s={B/dt:10,.0f}", flush=True)
    del tables
run(3, 128, 250_000)
run(3, 128, 280_000)
run(3, 96, 104_167)
run(3, 160, 62_500)
run(3, 192, 260_417)   # N=50M at d=192

"""Probe 22 (real fn, fake tables): can k=4 ride the fast path at small E?
Plus fast-path boundary mapping at d=128 and k=5 slow-path economics."""
import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpufm.engine.xla import make_search_fn

rng = np.random.default_rng(0)
B, L = 2**19, 120
_U32 = jnp.uint32

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
    tables = {
        "entries": jax.device_put(jnp.asarray(ent)),
        "dollar_pos": jnp.zeros(k, jnp.uint32),
        "dollar_base": jnp.full(k, 3, jnp.uint32),
        "dollar_block": jnp.zeros(k, jnp.uint32),
    }
    fn = jax.jit(make_search_fn(k, d, False, layout="fused"))
    dt = timed_call(fn, tables, jnp.uint32(bwtsize), q)
    print(f"k={k} d={d:3d} E={E:9,d} W={W:4d} ({W*4:5d} B, tab {(E+1)*W*4/1e6:8.1f} MB): {dt*1e3:8.1f} ms  reads/s={B/dt:10,.0f}", flush=True)
    del tables

run(4, 192, 52_085)    # k=4 at fast-path (d,E)?
run(4, 128, 78_127)    # k=4 at fast-path (d,E)?
run(3, 128, 208_335)   # boundary: fast at E=208K, d=128?
run(3, 128, 156_251)   # real-fn never tested this point
run(5, 256, 39_064)    # k=5 slow-path economics (24 rounds, 4.4 KB rows)
run(4, 192, 208_335)   # k=4, E at boundary

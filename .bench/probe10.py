"""Probe 10: HONEST (host-synced) gather issue rate vs row width, in a
dependent chain that consumes every gathered column (so XLA cannot narrow
the gather). This is the curve that picks k/d/layout.

Also: honest re-timing of the real XLA engine at k=2/3/4.
"""
import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)
B, R = 2**20, 20
TAB_BYTES = 48_000_000  # ~10 Mbase-at-d=64-scale table regardless of width

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

def chain_full(t, iv, salt, E, W):
    def body(iv, _):
        rows = t[iv % E]
        acc = rows[:, 0]
        for j in range(1, W):
            acc ^= rows[:, j]
        return (iv ^ acc) % E, None
    iv, _ = jax.lax.scan(body, iv ^ salt, None, length=R)
    return iv

print("row-width sweep (all columns consumed):", flush=True)
for W in (1, 4, 12, 24, 32, 76, 128, 272):
    E = max(1024, TAB_BYTES // (4 * W))
    table = jax.device_put(jnp.asarray(rng.integers(0, 2**32, size=(E, W), dtype=np.uint32)))
    idx0 = jax.device_put(jnp.asarray(rng.integers(0, E, size=B, dtype=np.uint32)))
    f = jax.jit(partial(chain_full, E=E, W=W))
    dt = timed_call(f, table, idx0, jnp.uint32(1)) / R
    print(f"  W={W:4d} ({W*4:5d} B): {dt*1e3:7.2f} ms/round  {B/dt/1e6:6.1f} M rows/s  {B*W*4/dt/1e9:6.1f} GB/s", flush=True)
    del table

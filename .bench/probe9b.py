"""Probe 9b: distinguish result-caching from broken sync on axon —
time the same chain with IDENTICAL args vs VARIED args per call."""
import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)
E, W, B, R = 156_251, 76, 2**20, 20
table = jax.device_put(jnp.asarray(rng.integers(0, 2**32, size=(E, W), dtype=np.uint32)))
idx0 = jax.device_put(jnp.asarray(rng.integers(0, E, size=B, dtype=np.uint32)))

def round_plain(t, iv):
    rows = t[iv % E]
    return (iv ^ rows[:, 0] ^ rows[:, W - 1]) % E

def round_sorted(t, iv):
    order = jnp.argsort(iv)
    g = t[iv[order] % E]
    val = g[:, 0] ^ g[:, W - 1]
    back = jnp.zeros_like(iv).at[order].set(val)
    return (iv ^ back) % E

def chain(t, iv, salt, fn):
    def body(iv, _):
        return fn(t, iv), None
    iv, _ = jax.lax.scan(body, iv ^ salt, None, length=R)
    return iv

for name, fn in [("plain", round_plain), ("sorted", round_sorted)]:
    f = jax.jit(partial(chain, fn=fn))
    out = f(table, idx0, jnp.uint32(0)); jax.block_until_ready(out)
    _ = np.asarray(out[:8])
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        out = f(table, idx0, jnp.uint32(i + 1))
        _ = np.asarray(out[:8])
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    print(f"{name:7s}: host-sync per call {[f'{t*1e3:.1f}' for t in ts]} ms -> {dt/R*1e3:7.2f} ms/round ({B/(dt/R)/1e6:6.1f} M g/s)", flush=True)

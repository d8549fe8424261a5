"""Probe 9: dependent-chain LF-round cost — plain random gather vs
sort+gather-in-order+scatter-back, and argsort cost alone.

If sorted-order gathers are faster enough to pay for the per-round
argsort + scatter, the engine should bucket intervals each round.
"""
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

def chain(t, iv, fn):
    def body(iv, _):
        return fn(t, iv), None
    iv, _ = jax.lax.scan(body, iv, None, length=R)
    return iv

def timed(f, *a, it=3):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(it): out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / it

f_plain = jax.jit(partial(chain, fn=round_plain))
f_sorted = jax.jit(partial(chain, fn=round_sorted))
f_sortonly = jax.jit(lambda iv: jnp.argsort(iv))

dt = timed(f_sortonly, idx0, it=10)
print(f"argsort 1M uint32 alone   : {dt*1e3:8.2f} ms", flush=True)
dt = timed(f_plain, table, idx0)
print(f"plain  round ({R} rounds)  : {dt/R*1e3:8.2f} ms/round  {B/(dt/R)/1e6:6.1f} M g/s", flush=True)
dt = timed(f_sorted, table, idx0)
print(f"sorted round ({R} rounds)  : {dt/R*1e3:8.2f} ms/round  {B/(dt/R)/1e6:6.1f} M g/s", flush=True)

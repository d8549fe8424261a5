"""Probe 16: map the gather perf cliff over (E, W) with engine-identical
shapes: carry [B,2] uint32, gather t[(iv//d) clamped] -> [B,2,W], consume
13 columns, 40 rounds. First: validate the harness reproduces the real
engine's fast/slow points."""
import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)
B, R = 2**19, 40

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

def chain(t, iv, salt, E, d):
    W = t.shape[1]
    n = jnp.uint32(E * d - 1)
    def body(iv, _):
        rows = t[iv // jnp.uint32(d)]            # [B,2,W]
        acc = rows[:, :, 0]
        for j in range(1, 13):
            acc ^= rows[:, :, j % W]
        iv = (iv * jnp.uint32(2654435761) + acc) % n
        return iv, None
    iv, _ = jax.lax.scan(body, iv ^ salt, None, length=R)
    return iv

def run(E, W, d=128):
    t = jax.device_put(jnp.asarray(rng.integers(0, 2**32, size=(E, W), dtype=np.uint32)))
    iv0 = jax.device_put(jnp.asarray(rng.integers(0, E * d, size=(B, 2), dtype=np.uint32)))
    f = jax.jit(partial(chain, E=E, d=d))
    dt = timed_call(f, t, iv0, jnp.uint32(1)) / R
    eq_reads = B / (dt * R) * (dt * R)  # n/a
    print(f"E={E:7d} W={W:4d} ({W*4:5d} B, tab {E*W*4/1e6:7.1f} MB): {dt*1e3:7.2f} ms/round  -> equiv reads/s {B/(dt*R):10,.0f}", flush=True)
    del t

# validation points vs real engine (all k=3, 40 rounds):
run(78128, 88)    # ~ N=10M d=128: engine 1.089M reads/s
run(312503, 88)   # ~ N=40M d=128: engine 635K
run(208336, 100, d=192)  # ~ N=40M d=192: engine 1.04M
run(156252, 76, d=64)    # ~ N=10M d=64: engine 639K

"""Probe 11 (honest timing): (a) do two independent gathers in one round
overlap? (b) real XLA engine honest throughput, fused vs split, k=2/3;
(c) Pallas DMA-pipeline kernel honest throughput."""
import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
from functools import partial
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)
B, R = 2**20, 20

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

# ---- (a) overlap test: W=12 gather + W=1 gather in the same round body
E = 250_000
t12 = jax.device_put(jnp.asarray(rng.integers(0, 2**32, size=(E, 12), dtype=np.uint32)))
t1 = jax.device_put(jnp.asarray(rng.integers(0, 2**32, size=(E, 1), dtype=np.uint32)))

def chain2(a, b, iv, salt, use_a=True, use_b=True):
    def body(iv, _):
        acc = iv
        if use_a:
            rows = a[iv % E]
            r = rows[:, 0]
            for j in range(1, 12):
                r ^= rows[:, j]
            acc = acc ^ r
        if use_b:
            acc = acc ^ b[iv % E][:, 0]
        return acc % E, None
    iv, _ = jax.lax.scan(body, iv ^ salt, None, length=R)
    return iv

idx0 = jax.device_put(jnp.asarray(rng.integers(0, E, size=B, dtype=np.uint32)))
for name, ua, ub in [("W12 only", True, False), ("W1 only", False, True), ("both", True, True)]:
    f = jax.jit(partial(chain2, use_a=ua, use_b=ub))
    dt = timed_call(f, t12, t1, idx0, jnp.uint32(1)) / R
    print(f"overlap {name:9s}: {dt*1e3:7.2f} ms/round", flush=True)

# ---- (b) real engines, honest
from tpufm import build_index, IndexConfig
from tpufm.engine.xla import XLAEngine
from tpufm.engine.oracle import search_oracle

N, L, NB = 10_000_000, 120, 2**19
codes = rng.integers(0, 4, size=N, dtype=np.uint8)
starts = rng.integers(0, N - L, size=2048)
qs = np.stack([codes[s:s + L] for s in starts])
q = np.concatenate([qs] * (NB // 2048))[:NB]
qd = jax.device_put(jnp.asarray(q, jnp.uint8))

for k in (2, 3):
    index = build_index(codes, IndexConfig(k=k, d=64))
    for layout in ("fused", "split"):
        eng = XLAEngine(index, layout=layout)
        dt = timed_call(lambda x: eng.search_device(x), qd)
        got = np.asarray(jax.device_get(eng.search_device(qd)))[:256]
        ok = (got == search_oracle(index, q[:256])).all()
        print(f"engine k={k} d=64 {layout:5s}: {dt*1e3:8.1f} ms  reads/s={NB/dt:10,.0f}  exact={ok}", flush=True)

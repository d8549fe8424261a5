"""Probe 8c: is block_until_ready real on axon? Compare against a timed
host round-trip of a tiny slice (forces full execution), and check a
dependent-chain timing with many rounds."""
import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)
E, W, B = 156_251, 76, 2**20
table = jax.device_put(jnp.asarray(rng.integers(0, 2**32, size=(E, W), dtype=np.uint32)))
idx_rand = jax.device_put(jnp.asarray(rng.integers(0, E, size=B, dtype=np.uint32)))

def dep_gather(t, idx, n):
    def body(iv, _):
        rows = t[iv % E]
        iv = (iv ^ rows[:, 0] ^ rows[:, W - 1]) % E
        return iv, None
    iv, _ = jax.lax.scan(body, idx, None, length=n)
    return iv

from functools import partial
f40 = jax.jit(partial(dep_gather, n=40))
f80 = jax.jit(partial(dep_gather, n=80))

for name, f in [("40 rounds", f40), ("80 rounds", f80)]:
    out = f(table, idx_rand); _ = np.asarray(out[:8])  # warm/compile
    # method A: block_until_ready
    t0 = time.perf_counter()
    for _ in range(2): out = f(table, idx_rand)
    jax.block_until_ready(out)
    dtA = (time.perf_counter() - t0) / 2
    # method B: host-fetch a slice each call (true sync)
    t0 = time.perf_counter()
    for _ in range(2):
        out = f(table, idx_rand); _ = np.asarray(out[:8])
    dtB = (time.perf_counter() - t0) / 2
    g = B * int(name.split()[0])
    print(f"{name}: blockA {dtA*1e3:9.2f} ms ({g/dtA/1e6:7.1f} M g/s)   syncB {dtB*1e3:9.2f} ms ({g/dtB/1e6:7.1f} M g/s)", flush=True)

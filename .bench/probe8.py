"""Probe 8: does index ORDER / DUPLICATION change XLA row-gather speed?

Questions for the sort-bucket optimization idea:
  a) random vs sorted indices, same count — locality win?
  b) heavy duplication (few unique rows) — coalescing win?
  c) gather from a 16M x 2 LUT table (the m=12 prefix LUT scenario)
  d) sort+gather+unsort end-to-end vs plain gather
"""
import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)
E = 156_251           # nentries for 10 Mbase, d=64
W = 76                # k=3 fused row words (12 bitmap + 64 counters) = 304 B
B = 2**20             # 1M ends (512K reads x 2)
table = jax.device_put(jnp.asarray(rng.integers(0, 2**32, size=(E, W), dtype=np.uint32)))

def timeit(f, *args, it=20):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(it): out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / it

@jax.jit
def plain_gather(t, idx):
    return jnp.sum(t[idx], axis=-1)

@jax.jit
def sort_gather_unsort(t, idx):
    order = jnp.argsort(idx)
    rows = t[idx[order]]
    out = jnp.zeros((idx.shape[0],), jnp.uint32).at[order].set(jnp.sum(rows, axis=-1))
    return out

idx_rand = jax.device_put(jnp.asarray(rng.integers(0, E, size=B, dtype=np.uint32)))
idx_sorted = jnp.sort(idx_rand)
idx_dup = jax.device_put(jnp.asarray(rng.integers(0, 64, size=B, dtype=np.uint32)))  # 64 unique rows
idx_same = jnp.zeros(B, jnp.uint32)

for name, idx in [("random", idx_rand), ("sorted", idx_sorted), ("64-unique", idx_dup), ("all-same", idx_same)]:
    dt = timeit(plain_gather, table, idx)
    print(f"gather 304B rows, {name:10s}: {dt*1e3:7.2f} ms  {B/dt/1e6:6.1f} M rows/s  {B*W*4/dt/1e9:6.1f} GB/s", flush=True)

dt = timeit(sort_gather_unsort, table, idx_rand)
print(f"sort+gather+unsort random    : {dt*1e3:7.2f} ms  {B/dt/1e6:6.1f} M rows/s", flush=True)

# LUT scenario: 16.7M x 2 uint32 table, 512K lookups
lut = jax.device_put(jnp.asarray(rng.integers(0, 2**32, size=(4**12, 2), dtype=np.uint32)))
idx_lut = jax.device_put(jnp.asarray(rng.integers(0, 4**12, size=B // 2, dtype=np.uint32)))
dt = timeit(plain_gather, lut, idx_lut)
print(f"LUT gather 8B rows from 16.7M: {dt*1e3:7.2f} ms  {(B//2)/dt/1e6:6.1f} M rows/s", flush=True)

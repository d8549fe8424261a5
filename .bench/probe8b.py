"""Probe 8b: sanity-check probe8 — force the full rows to be materialized
(XOR-reduce can't be hoisted through the gather as easily; also return the
raw rows) and check timing scales with iteration count."""
import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)
E, W, B = 156_251, 76, 2**20
table = jax.device_put(jnp.asarray(rng.integers(0, 2**32, size=(E, W), dtype=np.uint32)))

def timeit(f, *args, it=20):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(it): out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / it

@jax.jit
def sum_gather(t, idx):
    return jnp.sum(t[idx], axis=-1)

@jax.jit
def raw_gather(t, idx):
    return t[idx]

@jax.jit
def dep_gather(t, idx):
    # data-dependent chain of 4 gathers, like the real search round
    def body(iv, _):
        rows = t[iv % E]
        iv = (iv ^ rows[:, 0]) % E
        return iv, None
    iv, _ = jax.lax.scan(body, idx, None, length=4)
    return iv

idx_rand = jax.device_put(jnp.asarray(rng.integers(0, E, size=B, dtype=np.uint32)))
idx_sorted = jnp.sort(idx_rand)

for it in (5, 50):
    dt = timeit(sum_gather, table, idx_rand, it=it)
    print(f"sum_gather it={it:3d}: {dt*1e3:8.3f} ms/call", flush=True)
dt = timeit(raw_gather, table, idx_rand)
print(f"raw_gather (304MB out) random: {dt*1e3:8.3f} ms  {B/dt/1e6:7.1f} M rows/s  {B*W*4/dt/1e9:6.1f} GB/s", flush=True)
dt = timeit(raw_gather, table, idx_sorted)
print(f"raw_gather (304MB out) sorted: {dt*1e3:8.3f} ms  {B/dt/1e6:7.1f} M rows/s  {B*W*4/dt/1e9:6.1f} GB/s", flush=True)
dt = timeit(dep_gather, table, idx_rand, it=5)
print(f"dep_gather 4 rounds random   : {dt*1e3:8.3f} ms  {4*B/dt/1e6:7.1f} M rows/s", flush=True)
dt = timeit(dep_gather, table, idx_sorted, it=5)
print(f"dep_gather 4 rounds sorted0  : {dt*1e3:8.3f} ms  {4*B/dt/1e6:7.1f} M rows/s", flush=True)

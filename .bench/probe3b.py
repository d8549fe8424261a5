import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

rng = np.random.default_rng(0)
E, C, W = 156252, 16, 8
occ = jnp.asarray(rng.integers(0, 2**31, size=(E, C), dtype=np.int64).astype(np.uint32))
fused = jnp.asarray(rng.integers(0, 2**31, size=(E, C + W), dtype=np.int64).astype(np.uint32))

def timeit(f, *args, iters=20):
    t0 = time.perf_counter(); o = f(*args); jax.block_until_ready(o)
    print(f"    (compile+first {time.perf_counter()-t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters

B = 2**19
idx = jnp.asarray(rng.integers(0, E, size=B, dtype=np.int64).astype(np.uint32))
code = jnp.asarray(rng.integers(0, C, size=B, dtype=np.int64).astype(np.uint32))

tests = [
    ("occ[i,c] scalar", jax.jit(lambda i, c: occ[i, c]), (idx, code)),
    ("fused24 rows", jax.jit(lambda i: fused[i]), (idx,)),
    ("both-in-one", jax.jit(lambda i, c: (fused[i], occ[i, c])), (idx, code)),
]
for name, f, a in tests:
    print(f"B={B} {name}:", flush=True)
    dt = timeit(f, *a)
    print(f"    {dt*1e3:.3f} ms  {B/dt/1e6:.1f} Mrows/s  {B*(4*(C+W))/dt/1e9:.1f} GB/s-if-24w", flush=True)

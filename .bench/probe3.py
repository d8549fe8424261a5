import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

rng = np.random.default_rng(0)
E = 156252           # entries for 10M @ d=64
C = 16               # counters (k=2)
W = 8                # bitmap words
occ = jnp.asarray(rng.integers(0, 2**31, size=(E, C), dtype=np.int64).astype(np.uint32))
bm = jnp.asarray(rng.integers(0, 2**31, size=(E, W), dtype=np.int64).astype(np.uint32))
fused = jnp.concatenate([bm, occ], axis=1)                      # [E, 24]
fused_pad = jnp.pad(fused, ((0,0),(0,8)))                        # [E, 32]
fused128 = jnp.pad(fused, ((0,0),(0,104)))                       # [E, 128]

def timeit(f, *args, iters=20):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters

for B in [2**15, 2**17, 2**19, 2**21]:
    idx = jnp.asarray(rng.integers(0, E, size=B, dtype=np.int64).astype(np.uint32))
    code = jnp.asarray(rng.integers(0, C, size=B, dtype=np.int64).astype(np.uint32))

    f1 = jax.jit(lambda i, c: occ[i, c])                    # scalar 2D gather
    f2 = jax.jit(lambda i: bm[i])                           # 8-word row gather
    f3 = jax.jit(lambda i: fused[i])                        # 24-word row gather
    f3p = jax.jit(lambda i: fused_pad[i])                   # 32-word row gather
    f4 = jax.jit(lambda i: fused128[i])                     # 128-word row gather
    f5 = jax.jit(lambda i: jnp.take(fused, i, axis=0))      # take rows
    f6 = jax.jit(lambda i, c: jnp.take(occ.reshape(-1), i * C + c))  # flat scalar take

    r = {}
    r["occ[i,c]"] = timeit(f1, idx, code)
    r["bm rows8"] = timeit(f2, idx)
    r["fused24"] = timeit(f3, idx)
    r["fused32"] = timeit(f3p, idx)
    r["fused128"] = timeit(f4, idx)
    r["take24"] = timeit(f5, idx)
    r["flat-scalar"] = timeit(f6, idx, code)
    print(f"B={B}:")
    for k, v in r.items():
        rows_s = B / v
        print(f"  {k:12s} {v*1e3:8.3f} ms  {rows_s/1e6:8.1f} Mrows/s")

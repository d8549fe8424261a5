import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import probe35, numpy as np, jax.numpy as jnp, sys, time
N = 1 << 20
rng = np.random.default_rng(0)
E, W = 208_000, 128
ent = jnp.asarray(rng.integers(0, 2**32, (E, W), dtype=np.uint32))
idx = jnp.asarray(rng.integers(0, E, N, dtype=np.int32))
t0=time.perf_counter()
run = probe35.make_dma_gather(E, W, 32, N)
t = probe35.timeit(run, idx, ent)
print(f"compile+run took {time.perf_counter()-t0:.1f}s")
print(f"E={E} W={W} R=32 dma: {N/t/1e6:.1f} Mrows/s ({N*W*4/t/1e9:.1f} GB/s)")

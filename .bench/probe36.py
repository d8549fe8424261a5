"""probe36: is the per-row DMA gather issue-bound or concurrency-bound?
R sweep + unrolled issue + same-row (no randomness) variants."""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp, sys, time
import probe35

N = 1 << 20
rng = np.random.default_rng(0)
E, W = 208_000, 128
ent = jnp.asarray(rng.integers(0, 2**32, (E, W), dtype=np.uint32))
idx = jnp.asarray(rng.integers(0, E, N, dtype=np.int32))
idx0 = jnp.zeros(N, dtype=np.int32)  # all row 0: no DRAM randomness

for R in (8, 128):
    run = probe35.make_dma_gather(E, W, R, N)
    t = probe35.timeit(run, idx, ent)
    print(f"R={R:>3} random: {N/t/1e6:8.1f} Mrows/s ({N*W*4/t/1e9:6.1f} GB/s)", flush=True)

run = probe35.make_dma_gather(E, W, 32, N)
t = probe35.timeit(run, idx0, ent)
print(f"R= 32 same-row: {N/t/1e6:8.1f} Mrows/s (issue-rate ceiling)", flush=True)

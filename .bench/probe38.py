"""probe38: where does the engine's 83-97M rows/s go?

Variants at the flagship shape (E=208K):
  a) full-row XOR consumption, W=88, B in {512K, 1M, 2M}  (clean fusion)
  b) bitmap-width table W=24, B in {1M, 2M}
  c) two 1M gathers per step vs one 2M stacked gather (both full-row)
"""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import time, functools

E = 208_000
S = 64
rng = np.random.default_rng(0)

def timeit(fn, *args, iters=3):
    out = fn(*args); np.asarray(jax.device_get(out.ravel()[:1]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args); np.asarray(jax.device_get(out.ravel()[:1]))
        ts.append(time.perf_counter() - t0)
    return min(ts)

@functools.partial(jax.jit, static_argnums=(2,))
def chase_full(ent, iv0, steps):
    def body(iv, _):
        rows = ent[iv]                      # [B, W]
        acc = rows[:, 0]
        for w in range(1, rows.shape[1]):   # consume EVERY word
            acc ^= rows[:, w]
        return acc % np.uint32(E), None
    iv, _ = jax.lax.scan(body, iv0, None, length=steps)
    return iv

@functools.partial(jax.jit, static_argnums=(2,))
def chase_two(ent, iv0, steps):
    # iv0: [B, 2]; two SEPARATE B-index gathers per step (not stacked)
    def body(iv, _):
        o = []
        for e in range(2):
            rows = ent[iv[:, e]]
            acc = rows[:, 0]
            for w in range(1, rows.shape[1]):
                acc ^= rows[:, w]
            o.append(acc % np.uint32(E))
        return jnp.stack(o, axis=1), None
    iv, _ = jax.lax.scan(body, iv0, None, length=steps)
    return iv

for W in (88, 24):
    ent = jnp.asarray(rng.integers(0, 2**32, (E, W), dtype=np.uint32))
    for B in (524288, 1048576, 2097152):
        iv0 = jnp.asarray(rng.integers(0, E, B, dtype=np.uint32))
        t = timeit(chase_full, ent, iv0, S) / S
        print(f"full W={W:>3} B={B:>8}: {t*1e3:8.3f} ms/step  {B/t/1e6:7.1f} Mrows/s  {B*W*4/t/1e9:6.1f} GB/s", flush=True)

# c) 1M x 2 separate gathers vs 2M stacked, W=88
ent = jnp.asarray(rng.integers(0, 2**32, (E, 88), dtype=np.uint32))
iv0 = jnp.asarray(rng.integers(0, E, (1048576, 2), dtype=np.uint32))
t = timeit(chase_two, ent, iv0, S) / S
print(f"two-1M-gathers W=88: {t*1e3:8.3f} ms/step  {2*1048576/t/1e6:7.1f} Mrows/s", flush=True)

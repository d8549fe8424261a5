"""probe37: latency x concurrency model of the XLA TPU gather.

B parallel dependent pointer-chases (each lane's next index = f(current
row)), scanned S steps. rate(B) = min(B, C)/L where L = per-gather latency
and C = max outstanding gathers the hardware sustains. B=1 gives L; the
saturation knee gives C.

Rows are W=88 words (the k=3 d=128 engine row, 352 B) gathered from E rows.
"""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import time, sys, functools

E, W, S = 208_000, 88, 256
rng = np.random.default_rng(0)
ent = jnp.asarray(rng.integers(0, E, (E, W), dtype=np.uint32))  # values are themselves indices

@functools.partial(jax.jit, static_argnums=(2,))
def chase(ent, iv0, steps):
    def body(iv, _):
        rows = ent[iv]                   # [B, W] gather
        nxt = rows[:, 0] % np.uint32(E)  # dependent next index
        return nxt, None
    iv, _ = jax.lax.scan(body, iv0, None, length=steps)
    return iv

def timeit(fn, *args, iters=3):
    out = fn(*args); np.asarray(jax.device_get(out.ravel()[:1]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args); np.asarray(jax.device_get(out.ravel()[:1]))
        ts.append(time.perf_counter() - t0)
    return min(ts)

print(f"E={E} W={W} ({W*4}B rows), {S} dependent steps")
results = {}
for B in (1, 8, 64, 512, 4096, 32768, 262144, 1048576, 2097152):
    iv0 = jnp.asarray(rng.integers(0, E, B, dtype=np.uint32))
    t = timeit(chase, ent, iv0, S)
    per_step = t / S
    rate = B / per_step
    results[B] = rate
    print(f"B={B:>8}  {per_step*1e6:9.2f} us/step  {rate/1e6:9.2f} Mrows/s", flush=True)

L = 1 / results[1]  # seconds per gather at B=1
peak = max(results.values())
print(f"\nlatency L = {L*1e9:.0f} ns/gather (B=1 chain)")
print(f"peak rate = {peak/1e6:.1f} Mrows/s -> implied outstanding C = {peak*L:.0f}")

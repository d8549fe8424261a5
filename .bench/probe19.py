"""Probe 19: does padding the fused row fix slow (E,W) points?
k=3: at E=156251 (N=10M d=64, natural W=76 slow) and E=312502
(N=40M d=128, natural W=88 slow), pad W upward and time."""
import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpufm.engine.xla import _boundary_masks, _match_words

rng = np.random.default_rng(0)
B, L = 2**19, 120
_U32 = jnp.uint32

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

def make_fn(k, d, Wpad):
    nb = d // 32
    bmw = 2 * k * nb

    def search(entries, bwtsize, codes):
        Bq = codes.shape[1]
        iv0 = jnp.stack([jnp.zeros(Bq, _U32), jnp.full(Bq, bwtsize, _U32)], axis=1)

        def body(iv, code):
            block = iv // _U32(d)
            rows = entries[block]
            bm = rows[..., :bmw].reshape(rows.shape[:-1] + (k, 2, nb))
            cnt = jnp.take_along_axis(
                rows[..., bmw:], (code[:, None, None] + _U32(0)).astype(jnp.int32), axis=-1
            )[..., 0]
            masks = _boundary_masks(iv % _U32(d), nb)
            matched = _match_words(bm, code[:, None], k) & masks
            count = jnp.sum(jax.lax.population_count(matched), axis=-1)
            return cnt + count, None

        iv, _ = jax.lax.scan(body, iv0, codes)
        return iv

    return jax.jit(search)

def run(k, d, E, Wpad):
    nb = d // 32
    W = 2 * k * nb + 4**k
    Wp = max(W, Wpad)
    bwtsize = E * d - 7
    ent = rng.integers(0, 2**32, size=(E + 1, Wp), dtype=np.uint32)
    ent[:, 2 * k * nb:2 * k * nb + 4**k] = rng.integers(0, max(1, bwtsize - d), size=(E + 1, 4**k), dtype=np.uint32)
    entries = jax.device_put(jnp.asarray(ent))
    codes = jnp.asarray(rng.integers(0, 4**k, size=(L // k, B), dtype=np.uint32))
    fn = make_fn(k, d, Wp)
    dt = timed_call(fn, entries, jnp.uint32(bwtsize), codes)
    print(f"k={k} d={d:3d} E={E:9,d} W={Wp:4d} ({Wp*4:5d} B, tab {(E+1)*Wp*4/1e6:8.1f} MB): {dt*1e3:8.1f} ms  reads/s={B/dt:10,.0f}", flush=True)
    del entries

# canonical fast point, 4 fresh allocations
run(3, 128, 78_127, 88)
run(3, 128, 78_127, 88)
junk = jax.device_put(jnp.zeros((3000, 10000), jnp.float32))  # perturb allocator
run(3, 128, 78_127, 88)
del junk
run(3, 128, 78_127, 88)
run(3, 64, 156_251, 76)


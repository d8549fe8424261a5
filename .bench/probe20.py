"""Probe 20: real make_search_fn vs stripped round body, same fake table,
same process — is the dollar-correction compute what unlocks the fast gather?"""
import os, time, sys
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpufm.engine.xla import make_search_fn, _boundary_masks, _match_words

rng = np.random.default_rng(0)
B, L, k, d, E = 2**19, 120, 3, 128, 78_127
_U32 = jnp.uint32
nb = d // 32
W = 2 * k * nb + 4**k
bwtsize = E * d - 7

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

ent = rng.integers(0, 2**32, size=(E + 1, W), dtype=np.uint32)
ent[:, 2 * k * nb:] = rng.integers(0, bwtsize - d, size=(E + 1, 4**k), dtype=np.uint32)
entries = jax.device_put(jnp.asarray(ent))
tables = {
    "entries": entries,
    "dollar_pos": jnp.zeros(k, jnp.uint32),
    "dollar_base": jnp.full(k, 3, jnp.uint32),
    "dollar_block": jnp.zeros(k, jnp.uint32),
}
q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
codes = jnp.asarray(rng.integers(0, 4**k, size=(L // k, B), dtype=np.uint32))

# (1) real engine fn
fn_real = jax.jit(make_search_fn(k, d, False, layout="fused"))
dt = timed_call(fn_real, tables, jnp.uint32(bwtsize), q)
print(f"real make_search_fn : {dt*1e3:8.1f} ms  reads/s={B/dt:10,.0f}", flush=True)

# (2) stripped (no dollar fix, codes precomputed)
bmw = 2 * k * nb
def stripped(entries, bwtsize, codes):
    iv0 = jnp.stack([jnp.zeros(B, _U32), jnp.full(B, bwtsize, _U32)], axis=1)
    def body(iv, code):
        block = iv // _U32(d)
        rows = entries[block]
        bm = rows[..., :bmw].reshape(rows.shape[:-1] + (k, 2, nb))
        cnt = jnp.take_along_axis(rows[..., bmw:], (code[:, None, None] + _U32(0)).astype(jnp.int32), axis=-1)[..., 0]
        masks = _boundary_masks(iv % _U32(d), nb)
        matched = _match_words(bm, code[:, None], k) & masks
        count = jnp.sum(jax.lax.population_count(matched), axis=-1)
        return cnt + count, None
    iv, _ = jax.lax.scan(body, iv0, codes)
    return iv
fn_str = jax.jit(stripped)
dt = timed_call(fn_str, entries, jnp.uint32(bwtsize), codes)
print(f"stripped            : {dt*1e3:8.1f} ms  reads/s={B/dt:10,.0f}", flush=True)

# (3) real engine fn again (order effect?)
dt = timed_call(fn_real, tables, jnp.uint32(bwtsize), q)
print(f"real again          : {dt*1e3:8.1f} ms  reads/s={B/dt:10,.0f}", flush=True)

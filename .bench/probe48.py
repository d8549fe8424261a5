import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from tpufm.config import IndexConfig
from tpufm.index import builder_device as BD
from tpufm.index.sa_device import suffix_array_device_arr

def sync(x):
    for leaf in jax.tree.leaves(x):
        np.asarray(jax.device_get(leaf.ravel()[:1]))

rng = np.random.default_rng(0)
n = 250_000_000
codes = rng.integers(0, 4, size=n, dtype=np.uint8)
cfg = IndexConfig(k=3, d=192)
T = time.perf_counter
t0=T(); cd = jax.device_put(jnp.asarray(codes, jnp.uint8)); sync(cd); print(f"put {T()-t0:.1f}", flush=True)
t0=T(); order = suffix_array_device_arr(cd); sync(order); print(f"sa {T()-t0:.1f}", flush=True)
t0=T(); oc, bm, dp = BD._build_tables(3, 192)(cd, order); sync((oc,bm,dp)); print(f"tables {T()-t0:.1f}", flush=True)
t0=T(); dollar_pos = np.asarray(jax.device_get(dp), np.uint32); print(f"dp fetch {T()-t0:.1f}", flush=True)
t0=T(); rows = np.asarray(jax.device_get(bm[(dollar_pos // np.uint32(192)).astype(np.int32)])); print(f"bm rows fetch {T()-t0:.1f}", flush=True)
E, C = oc.shape
sub = np.zeros((E, C), np.uint32); sub[0,0] = 1
t0=T(); oc2 = oc - jnp.asarray(sub); sync(oc2); print(f"sub transfer+apply {T()-t0:.1f}", flush=True)
t0=T(); occ = jnp.concatenate([jnp.zeros((1, C), jnp.uint32), jnp.cumsum(oc2, axis=0, dtype=jnp.uint32)]); sync(occ); print(f"cumsum {T()-t0:.1f}", flush=True)
t0=T(); totals = np.asarray(jax.device_get(occ[-1]), np.int64); print(f"totals fetch {T()-t0:.1f}", flush=True)

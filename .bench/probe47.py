"""probe47: where does the 250M device build time go? Per-stage timings."""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, time, jax.numpy as jnp
from tpufm.index import sa_device
from tpufm.index.builder_device import _build_tables

def sync(x):
    for leaf in jax.tree.leaves(x):
        np.asarray(jax.device_get(leaf.ravel()[:1]))

rng = np.random.default_rng(0)
for n in (64_000_000, 250_000_000):
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    t0 = time.perf_counter()
    cd = jax.device_put(jnp.asarray(codes)); sync(cd)
    t_put = time.perf_counter() - t0

    initial, step = sa_device._build_steps() if sa_device._steps is None else sa_device._steps
    sa_device._steps = (initial, step)
    t0 = time.perf_counter()
    rank, order, distinct = initial(cd); d = bool(jax.device_get(distinct))
    t_init = time.perf_counter() - t0
    h = 10; rounds = []
    while not d and h < n + 1:
        t0 = time.perf_counter()
        rank, order, distinct = step(rank, jnp.uint32(h)); d = bool(jax.device_get(distinct))
        rounds.append(round(time.perf_counter() - t0, 2)); h *= 2
    t0 = time.perf_counter()
    tables = _build_tables(3, 192)
    occ_counts, bitmaps, dollar_pos = tables(cd, order); sync((occ_counts, bitmaps, dollar_pos))
    t_tab = time.perf_counter() - t0
    print(f"n={n}: put {t_put:.1f}s | sa-initial {t_init:.1f}s | rounds {rounds} | tables {t_tab:.1f}s", flush=True)

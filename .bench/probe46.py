"""probe46: can a different row-consumer flip the valley (E=312K) to the
gather fast path? A/B: take_along_axis (current), one-hot counter select,
and a split bitmap-reshape variant."""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
import tpufm.engine.xla as X
from tpufm.config import IndexConfig
from tpufm.index.builder import build_index
from tpufm.io.genreads import generate_reads
from tpufm.engine.oracle import search_oracle
from tpufm.utils.timer import timed_device_passes

_U32 = jnp.uint32
rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=40_000_000, dtype=np.uint8)
index = build_index(codes, IndexConfig(k=3, d=128))
B = 1 << 20
queries = generate_reads(codes, 120, B, seed=1)
qd = jax.device_put(jnp.asarray(queries, jnp.uint8))
expect = search_oracle(index, queries[:256])

orig = X.lf_step_fused

def onehot(tables, cfg, interval, code, gather_fn=None):
    k, d, nb = cfg
    bmw = 2 * k * nb
    block = interval // _U32(d)
    rows = tables["entries"][block]
    bm_rows = rows[..., :bmw].reshape(rows.shape[:-1] + (k, 2, nb))
    cnt_mat = rows[..., bmw:]
    col = jax.lax.broadcasted_iota(jnp.int32, cnt_mat.shape, cnt_mat.ndim - 1)
    cnt = jnp.sum(jnp.where(col == code[:, None, None].astype(jnp.int32), cnt_mat, _U32(0)), axis=-1)
    masks = X._boundary_masks(interval % _U32(d), nb)
    matched = X._match_words(bm_rows, code[:, None], k) & masks
    count = jnp.sum(jax.lax.population_count(matched), axis=-1)
    dpos, dbase, dblock = tables["dollar_pos"], tables["dollar_base"], tables["dollar_block"]
    hit = ((block[..., None] == dblock) & (code[:, None, None] == dbase)
           & (interval[..., None] > dpos))
    count -= jnp.sum(hit.astype(_U32), axis=-1)
    return cnt + count

for name, fn in (("take_along_axis", orig), ("one-hot", onehot)):
    X.lf_step_fused = fn
    eng = X.XLAEngine(index, lut_m=12)
    dt, _ = timed_device_passes(lambda: eng.search_device(qd), iterations=3)
    out = np.asarray(jax.device_get(eng.search_device(qd)))[:256]
    ok = bool((out == expect).all())
    print(f"valley {name:>16}: {B/dt/1e3:8.1f}K reads/s  exact={ok}", flush=True)
X.lf_step_fused = orig

"""probe52: valley (40M, E=312K, k=3 d=128) — untried gather lowerings:
(b) u64-packed rows (half the gathered elements/row), (c) transposed table."""
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

def body_from_rows(tables, cfg, interval, code, rows):
    k, d, nb = cfg
    bmw = 2 * k * nb
    bm_rows = rows[..., :bmw].reshape(rows.shape[:-1] + (k, 2, nb))
    cnt = jnp.take_along_axis(rows[..., bmw:], (code[:, None, None] + _U32(0)).astype(jnp.int32), axis=-1)[..., 0]
    masks = X._boundary_masks(interval % _U32(d), nb)
    matched = X._match_words(bm_rows, code[:, None], k) & masks
    count = jnp.sum(jax.lax.population_count(matched), axis=-1)
    dpos, dbase, dblock = tables["dollar_pos"], tables["dollar_base"], tables["dollar_block"]
    block = interval // _U32(d)
    hit = ((block[..., None] == dblock) & (code[:, None, None] == dbase) & (interval[..., None] > dpos))
    count -= jnp.sum(hit.astype(_U32), axis=-1)
    return cnt + count

def step_u64(tables, cfg, interval, code, gather_fn=None):
    block = interval // _U32(cfg[1])
    rows64 = tables["entries64"][block]                 # [B, 2, W/2] u64 gather
    rows = jax.lax.bitcast_convert_type(rows64, jnp.uint32).reshape(rows64.shape[:-1] + (-1,))
    return body_from_rows(tables, cfg, interval, code, rows)

def step_T(tables, cfg, interval, code, gather_fn=None):
    block = interval // _U32(cfg[1])
    taken = jnp.take(tables["entriesT"], block, axis=1)  # [W, B, 2]
    rows = jnp.moveaxis(taken, 0, -1)                    # [B, 2, W]
    return body_from_rows(tables, cfg, interval, code, rows)

for name, fn, extra in (
    ("baseline", orig, None),
    ("u64-rows", step_u64, "u64"),
    ("transposed", step_T, "T"),
):
    X.lf_step_fused = orig
    eng = X.XLAEngine(index, lut_m=12)  # LUT built with the stock step
    ent = np.asarray(jax.device_get(eng.tables["entries"]))
    if extra == "u64":
        eng.tables["entries64"] = jax.device_put(np.ascontiguousarray(ent).view(np.uint64))
    elif extra == "T":
        eng.tables["entriesT"] = jax.device_put(np.ascontiguousarray(ent.T))
    X.lf_step_fused = fn
    eng._search = jax.jit(X.make_search_fn(3, 128, False, layout="fused", lut_m=12))
    dt, _ = timed_device_passes(lambda: eng.search_device(qd), iterations=3)
    out = np.asarray(jax.device_get(eng.search_device(qd)))[:256]
    ok = bool((out == expect).all())
    print(f"valley {name:>11}: {B/dt/1e3:8.1f}K reads/s  exact={ok}", flush=True)
X.lf_step_fused = orig

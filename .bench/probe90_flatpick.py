"""Probe 90: the copy.34 hybrid — run the binary-tree counter pick on the
FLAT [2B, W] gather output so only the bitmap words pay the [B, 2, W]
relayout (VERDICT r4 item 1). The relayout (copy.34) was 2.9 ms of the
11.7 ms flagship round; PERF.md round 4 waved the hybrid off by estimate
("roughly a wash"). This measures it, bracketed by unpatched controls.
Protocol: 10 Mbase, k=3 d=192 fused + lut12, 1M-read waves, device-resident.
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
import jax.numpy as jnp
from tpufm.bench import _enable_compile_cache
_enable_compile_cache()
from tpufm.config import IndexConfig
from tpufm.engine.xla import (XLAEngine, _pick_counter, _match_words,
                              _boundary_masks, fuse_prefix_codes,
                              fuse_round_codes)
from tpufm.index.builder import build_index
from tpufm.io.genreads import generate_reads
from tpufm.utils.timer import timed_device_passes

_U32 = jnp.uint32
K, D, LUT = 3, 192, 12
rng = np.random.default_rng(0)
codes = rng.integers(0, 4, 10_000_000, dtype=np.uint8)
index = build_index(codes, IndexConfig(k=K, d=D))
q = generate_reads(codes, 120, 1 << 20, seed=1)
eng = XLAEngine(index, lut_m=LUT)
qd = jax.device_put(np.asarray(q))

def lf_step_hybrid(tables, interval, code):
    k, d, nb = K, D, D // 32
    bmw = 2 * k * nb
    block = interval // _U32(d)
    flat = tables["entries"][block.reshape(-1)]          # [2B, W] flat gather
    code2 = jnp.broadcast_to(code[:, None], block.shape).reshape(-1)
    cnt = _pick_counter(flat[:, bmw:bmw + 4**k], code2, k).reshape(block.shape)
    bm_rows = flat[:, :bmw].reshape(block.shape + (k, 2, nb))  # only bm relayouts
    masks = _boundary_masks(interval % _U32(d), nb)
    matched = _match_words(bm_rows, code[:, None], k) & masks
    count = jnp.sum(jax.lax.population_count(matched), axis=-1)
    dpos, dbase, dblock = (tables["dollar_pos"], tables["dollar_base"],
                           tables["dollar_block"])
    hit = ((block[..., None] == dblock) & (code[:, None, None] == dbase)
           & (interval[..., None] > dpos))
    count -= jnp.sum(hit.astype(_U32), axis=-1)
    return cnt + count

@jax.jit
def search_hybrid(tables, queries):
    iv0 = tables["lut"][fuse_prefix_codes(queries, LUT)]
    codes_r = fuse_round_codes(queries[:, :120 - LUT], K)
    def body(iv, code):
        return lf_step_hybrid(tables, iv, code), None
    iv, _ = jax.lax.scan(body, iv0, codes_r)
    return iv

def rate_std():
    dt, _ = timed_device_passes(lambda: eng.search_device(qd), iterations=5)
    return (1 << 20) / dt

def rate_hybrid():
    out = search_hybrid(eng.tables, qd)
    exact = bool(np.array_equal(np.asarray(jax.device_get(out)),
                                np.asarray(eng.search(q))))
    dt, _ = timed_device_passes(lambda: search_hybrid(eng.tables, qd), iterations=5)
    return (1 << 20) / dt, exact

ctl_before = rate_std()
hyb, exact = rate_hybrid()
ctl_after = rate_std()
rec = {"probe": 90, "ctl_before": round(ctl_before), "hybrid_flat_pick": round(hyb),
       "ctl_after": round(ctl_after), "bit_exact": exact,
       "delta_pct": round(100 * (hyb / max(ctl_before, ctl_after) - 1), 2)}
print(json.dumps(rec))
with open("/root/repo/.bench/probe90_flatpick.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")

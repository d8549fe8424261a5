"""Probe 81: fold the interval-ends dim into the batch dim (flat [2B]
lanes) — the tiling-padding hypothesis.

probe80 refuted consumer/gather fusion serialization (barrier split is
a wash). Remaining explanation for the ~10 ms/round of non-gather time:
every round tensor is [B, 2, w] — the TPU tiles the minor two dims
(2, w) up to (8, 128), so the dominant rows buffer [B, 2, 88] occupies
5.8x its logical bytes (sublane dim 2 -> 8 padding x lane 88 -> 128),
and every consumer op pays it. Folding ends into batch gives [2B, 88]:
fully packed sublanes, 1.45x lanes — a predicted ~4x cut in round
memory traffic outside the gather itself.

A/B: engine lf_step_fused vs a flat-lane reimplementation (identical
math, [B,2] in/out preserved via two cheap [B,2]<->[2B] transposes per
round), bracketed, at the new flagship (d=192, 10M), d=128 10M, and an
HBM point (E=625K d=192). Bit-exactness asserted.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tpufm.engine.xla as X
from tpufm.engine.xla import make_search_fn

_U32 = jnp.uint32
rng = np.random.default_rng(0)
B, L = 1 << 20, 120
HEALTHY = 1_200_000
OUT = "/root/repo/.bench/probe81_session.jsonl"


def log(o):
    o["t"] = round(time.time())
    print(json.dumps(o), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(o) + "\n")


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:8]))


def timed(f, *a, it=3):
    out = f(*a)
    sync(out)
    ts = []
    for _ in range(it):
        t0 = time.perf_counter()
        out = f(*a)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def mk_tables(E, k, d, lut_m=0):
    nb = d // 32
    W = 2 * k * nb + 4**k
    span = E * d - 8
    ent = rng.integers(0, 2**32, size=(E + 1, W), dtype=np.uint32)
    ent[:, 2 * k * nb :] = rng.integers(0, span, size=(E + 1, 4**k),
                                        dtype=np.uint32)
    tables = {
        "entries": jax.device_put(jnp.asarray(ent)),
        "dollar_pos": jnp.zeros(k, _U32),
        "dollar_base": jnp.full(k, 3, _U32),
        "dollar_block": jnp.zeros(k, _U32),
    }
    if lut_m:
        lut = rng.integers(0, span, size=(4**lut_m, 2), dtype=np.uint32)
        tables["lut"] = jax.device_put(jnp.asarray(lut))
    return tables


def lf_step_fused_flat(tables, cfg, interval, code, gather_fn=None):
    """Identical math to X.lf_step_fused, flat [2B] lanes."""
    k, d, nb = cfg
    bmw = 2 * k * nb
    iv = interval.T.reshape(-1)  # [2B]: all lo ends, then all hi ends
    block = iv // _U32(d)
    rows = tables["entries"][block]  # [2B, W]
    code2 = jnp.tile(code, 2)
    bm_rows = rows[..., :bmw].reshape(rows.shape[:-1] + (k, 2, nb))
    cnt = X._pick_counter(rows[..., bmw : bmw + 4**k], code2, k)
    masks = X._boundary_masks(iv % _U32(d), nb)
    matched = X._match_words(bm_rows, code2, k) & masks
    count = jnp.sum(jax.lax.population_count(matched), axis=-1)
    dpos, dbase, dblock = (
        tables["dollar_pos"], tables["dollar_base"], tables["dollar_block"]
    )
    hit = (
        (block[:, None] == dblock)
        & (code2[:, None] == dbase)
        & (iv[:, None] > dpos)
    )
    count -= jnp.sum(hit.astype(_U32), axis=-1)
    return (cnt + count).reshape(2, -1).T  # [B, 2]


def main():
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    orig = X.lf_step_fused
    points = [("10M_d192", 52_084, 192), ("10M_d128", 78_125, 128),
              ("hbm_625K_d192", 625_000, 192)]
    ctl_tab = mk_tables(78_127, 3, 128, lut_m=12)
    ctl_fn = jax.jit(make_search_fn(3, 128, False, layout="fused",
                                    lut_m=12))

    def ctl():
        return B / timed(ctl_fn, ctl_tab, _U32(78_127 * 128 - 8), q, it=2)

    jobs = []
    for tag, E, d in points:
        for variant in ("engine", "flat"):
            jobs.append((tag, E, d, variant))
    done = set()
    deadline = time.time() + 3 * 3600
    outs = {}
    while len(done) < len(jobs) and time.time() < deadline:
        c0 = ctl()
        log({"exp": "probe81_ctl", "reads_per_s": round(c0)})
        if c0 < HEALTHY:
            time.sleep(600)
            continue
        for tag, E, d, variant in jobs:
            if (tag, variant) in done:
                continue
            tables = mk_tables(E, 3, d, lut_m=12)
            X.lf_step_fused = orig if variant == "engine" else lf_step_fused_flat
            try:
                fn = jax.jit(make_search_fn(3, d, False, layout="fused",
                                            lut_m=12))
                dt = timed(fn, tables, _U32(E * d - 8), q)
                out = np.asarray(jax.device_get(fn(tables, _U32(E * d - 8), q)))
            finally:
                X.lf_step_fused = orig
            c1 = ctl()
            exact = None
            if (tag, "engine") in outs and variant == "flat":
                exact = bool(np.array_equal(out, outs[(tag, "engine")]))
            if variant == "engine":
                outs[(tag, "engine")] = out
            rec = {"exp": "probe81", "tag": tag, "E": E, "d": d,
                   "variant": variant, "reads_per_s": round(B / dt),
                   "exact_vs_engine": exact,
                   "ctl_after": round(c1), "accepted": c1 >= HEALTHY}
            log(rec)
            del tables
            if c1 >= HEALTHY:
                done.add((tag, variant))
            else:
                break
    log({"exp": "probe81_done", "accepted": len(done), "of": len(jobs)})


if __name__ == "__main__":
    main()

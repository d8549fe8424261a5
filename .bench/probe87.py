"""Probe 87: the last LUT rung — lut_m=15 vs 12 at protocol scale.

With the single-chip round declared at its expressible optimum
(probes 78-84), the only remaining lever is rounds/read. At k=3 L=120
the LUT ladder is m in {12, 15, 18} ((L-m) %% k == 0): m=12 is the
flagship (36 rounds + 1 LUT gather), m=15 cuts one round (35) for a
4^15-entry LUT = 8.6 GB in HBM — predicted +71/69 ~ +2.9%% if the
gather-issue-rate model holds and the LUT gather itself doesn't slow
down or the gather runtime doesn't pre-copy the 8.6 GB table (the
probe85 copy.28 mechanism would OOM it: 17.2 GB > 15.75).

Bracketed per the round-4 methodology: healthgate-style control before
and after every point. The LUT content is random (rate-only probe; the
real build_prefix_lut path is bit-exact by construction and measured
separately for build time).
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

from tpufm.engine.xla import make_search_fn

_U32 = jnp.uint32
rng = np.random.default_rng(0)
B, L = 1 << 20, 120
HEALTHY = 1_200_000
OUT = "/root/repo/.bench/probe87_session.jsonl"


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
        # generate ON DEVICE: an 8.6 GB host->device transfer through the
        # tunnel would dominate the probe (and the real LUT is device-built)
        key = jax.random.PRNGKey(lut_m)
        tables["lut"] = jax.random.randint(
            key, (4**lut_m, 2), 0, span, dtype=jnp.uint32
        )
    return tables


def main():
    k, d = 3, 192
    E = 52_084  # 10 Mbase at d=192 — the protocol-scale table
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    ctl_tab = mk_tables(78_127, 3, 128, lut_m=12)
    ctl_fn = jax.jit(make_search_fn(3, 128, False, layout="fused", lut_m=12))

    def ctl():
        return B / timed(ctl_fn, ctl_tab, _U32(78_127 * 128 - 8), q, it=2)

    points = [("lut12", 12), ("lut15", 15)]
    done = {}
    deadline = time.time() + 2 * 3600
    while len(done) < len(points) and time.time() < deadline:
        c0 = ctl()
        log({"exp": "probe87_ctl", "reads_per_s": round(c0)})
        if c0 < HEALTHY:
            time.sleep(300)
            continue
        for tag, m in points:
            if tag in done:
                continue
            fn = jax.jit(make_search_fn(3, d, False, layout="fused", lut_m=m))
            try:
                tables = mk_tables(E, 3, d, lut_m=m)
                dt = timed(fn, tables, _U32(E * d - 8), q)
            except Exception as e:  # OOM is a result here, not a crash
                log({"exp": "probe87", "tag": tag, "error": repr(e)[:300]})
                done[tag] = None
                continue
            c1 = ctl()
            log({"exp": "probe87", "tag": tag, "lut_m": m,
                 "lut_gb": round(4**m * 8 / 1e9, 2),
                 "reads_per_s": round(B / dt),
                 "ctl_after": round(c1), "accepted": c1 >= HEALTHY})
            del tables
            if c1 >= HEALTHY:
                done[tag] = round(B / dt)
            else:
                break
    log({"exp": "probe87_done", "rates": done})


if __name__ == "__main__":
    main()

"""Probe 85: the HBM regime at true genome scale.

The tree-pick regime map (probes 74/75) is flat ~940-970K reads/s from
492K to 1.3M rows; a human genome at d=192 is 16.7M rows (6.7 GB of
entries in HBM) — 13x beyond the mapped range. One bracketed ladder
E in {2M, 8M, 16.7M} at the flagship config (k=3 d=192 fused lut12,
1M-read waves) pins whether the flat regime holds to genome scale.
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
OUT = "/root/repo/.bench/probe85_session.jsonl"


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


def main():
    k, d, lut_m = 3, 192, 12
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    ctl_tab = mk_tables(78_127, 3, 128, lut_m=12)
    ctl_fn = jax.jit(make_search_fn(3, 128, False, layout="fused", lut_m=12))

    def ctl():
        return B / timed(ctl_fn, ctl_tab, _U32(78_127 * 128 - 8), q, it=2)

    fn = jax.jit(make_search_fn(3, d, False, layout="fused", lut_m=lut_m))
    points = [("2M", 2_000_000), ("8M", 8_000_000),
              ("genome_16.7M", 16_666_667)]
    done = set()
    deadline = time.time() + 3 * 3600
    while len(done) < len(points) and time.time() < deadline:
        c0 = ctl()
        log({"exp": "probe85_ctl", "reads_per_s": round(c0)})
        if c0 < HEALTHY:
            time.sleep(600)
            continue
        for tag, E in points:
            if tag in done:
                continue
            tables = mk_tables(E, 3, d, lut_m=lut_m)
            dt = timed(fn, tables, _U32(E * d - 8), q)
            c1 = ctl()
            log({"exp": "probe85", "tag": tag, "E": E, "d": d,
                 "hbm_gb": round(E * (36 + 64) * 4 / 1e9, 2),
                 "reads_per_s": round(B / dt),
                 "ctl_after": round(c1), "accepted": c1 >= HEALTHY})
            del tables
            if c1 >= HEALTHY:
                done.add(tag)
            else:
                break
    log({"exp": "probe85_done", "accepted": len(done), "of": len(points)})


if __name__ == "__main__":
    main()

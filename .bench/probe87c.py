"""Probe 87c: lut15, take three — output-only fake-LUT materialization.

87 (randint) and 87b (tile) both OOMed BUILDING the 8.6 GB fake LUT
(randint's bit+remainder intermediates; tile's broadcast+reshape), not
searching with it: a bare [2^30, 2] u32 allocates fine on device (no
lane-pad inflation — measured ladder 2.1/4.3/6.4/8.6 GB all OK) and the
flagship HLO shows the LUT gather takes the parameter directly (no
copy.28-style working copy). Here the fake LUT is one fused
iota-multiply-mod (single 8.6 GB buffer), then the lut15 flagship
(35 rounds + LUT gather vs lut12's 36 + 1; predicted +2.8%).
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

        @jax.jit
        def mk_lut():
            # Knuth multiplicative hash of the flat iota: well-spread
            # pseudo-random values < span, ONE output buffer, no
            # generation intermediates
            i = jax.lax.broadcasted_iota(jnp.uint32, (4**lut_m, 2), 0)
            j = jax.lax.broadcasted_iota(jnp.uint32, (4**lut_m, 2), 1)
            return ((i * jnp.uint32(2654435761) + j * jnp.uint32(40503))
                    % jnp.uint32(span))

        tables["lut"] = jax.block_until_ready(mk_lut())
    return tables


def main():
    k, d = 3, 192
    E = 52_084
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    ctl_tab = mk_tables(78_127, 3, 128, lut_m=12)
    ctl_fn = jax.jit(make_search_fn(3, 128, False, layout="fused", lut_m=12))

    def ctl():
        return B / timed(ctl_fn, ctl_tab, _U32(78_127 * 128 - 8), q, it=2)

    deadline = time.time() + 2 * 3600
    while time.time() < deadline:
        c0 = ctl()
        log({"exp": "probe87c_ctl", "reads_per_s": round(c0)})
        if c0 < HEALTHY:
            time.sleep(300)
            continue
        fn = jax.jit(make_search_fn(3, d, False, layout="fused", lut_m=15))
        try:
            tables = mk_tables(E, 3, d, lut_m=15)
            dt = timed(fn, tables, _U32(E * d - 8), q)
        except Exception as e:
            log({"exp": "probe87c", "tag": "lut15_iota",
                 "error": repr(e)[:300]})
            break
        c1 = ctl()
        log({"exp": "probe87c", "tag": "lut15_iota", "lut_m": 15,
             "lut_gb": round(4**15 * 8 / 1e9, 2),
             "reads_per_s": round(B / dt),
             "ctl_after": round(c1), "accepted": c1 >= HEALTHY})
        if c1 >= HEALTHY:
            break
    log({"exp": "probe87c_done"})


if __name__ == "__main__":
    main()

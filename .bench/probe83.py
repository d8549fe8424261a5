"""Probe 83: the Pallas round body, round-4 edition.

ROADMAP item 1 names the Mosaic round body as the one unexplored
formulation for the ~9 ms/round of non-gather time. PallasEngine already
IS that split (XLA gather -> Pallas VPU round kernel) and historically
landed within 3% of pure-XLA — but that was with the one-hot counter
pick, before the tree pick won the XLA-side shootout (probe63) and
doubled the HBM regime (probe75). This probe re-runs the A/B with the
tree pick now ported into the kernel (pallas_kernel.py), across tile
sizes, at the d=192 flagship point and one HBM point. Bracketed per the
round-4 methodology (fake-table flagship control before/after each
point, accept only if both healthy).
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

from tpufm.engine.pallas_kernel import make_pallas_search_fn
from tpufm.engine.xla import make_search_fn

_U32 = jnp.uint32
rng = np.random.default_rng(0)
B, L = 1 << 20, 120
HEALTHY = 1_200_000
OUT = "/root/repo/.bench/probe83_session.jsonl"


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
    k, lut_m = 3, 12
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    ctl_tab = mk_tables(78_127, 3, 128, lut_m=12)
    ctl_fn = jax.jit(make_search_fn(3, 128, False, layout="fused", lut_m=12))

    def ctl():
        return B / timed(ctl_fn, ctl_tab, _U32(78_127 * 128 - 8), q, it=2)

    # The [2M,1] loop carries + pallas output land in scoped vmem inside
    # the while body; the default 16M limit OOMs the compile, 64M fits
    # (first measured here) — carried as a compiler option on the pallas
    # variants only.
    points = [("10M_d192", 52_084, 192), ("hbm_417K_d192", 416_668, 192)]
    variants = [("xla", None), ("pallas_t4096", 4096),
                ("pallas_t8192", 8192), ("pallas_t16384", 16384)]
    jobs = [(t, E, d, v, tile) for t, E, d in points for v, tile in variants]
    done = set()
    deadline = time.time() + 3 * 3600
    while len(done) < len(jobs) and time.time() < deadline:
        c0 = ctl()
        log({"exp": "probe83_ctl", "reads_per_s": round(c0)})
        if c0 < HEALTHY:
            time.sleep(600)
            continue
        for tag, E, d, variant, tile in jobs:
            if (tag, variant) in done:
                continue
            tables = mk_tables(E, 3, d, lut_m=lut_m)
            if variant == "xla":
                fn = jax.jit(make_search_fn(3, d, False, layout="fused",
                                            lut_m=lut_m))
            else:
                fn = jax.jit(
                    make_pallas_search_fn(3, d, tile=tile, lut_m=lut_m),
                    compiler_options={
                        "xla_tpu_scoped_vmem_limit_kib": 65536
                    },
                )
            dt = timed(fn, tables, _U32(E * d - 8), q)
            c1 = ctl()
            log({"exp": "probe83", "tag": tag, "E": E, "d": d,
                 "variant": variant, "reads_per_s": round(B / dt),
                 "ctl_after": round(c1), "accepted": c1 >= HEALTHY})
            del tables, fn
            if c1 >= HEALTHY:
                done.add((tag, variant))
            else:
                break
    log({"exp": "probe83_done", "accepted": len(done), "of": len(jobs)})


if __name__ == "__main__":
    main()

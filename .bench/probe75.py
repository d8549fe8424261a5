"""Probe 75: is the tree counter pick hurting the HBM (over-VMEM) regime?

probe71 measured 268-326K reads/s at 120-250 Mbase today, vs round 3's
~700K (take_along_axis engine) and probe64's 943K (tree engine, 63M
d=128). Either today's device is slower in the HBM regime, or the tree
pick (63 full-width selects that must ride the gather consumer) fuses
badly once the gather reads HBM. A/B the pick formulation with
everything else byte-identical, fake tables (rate follows table size):

  E x d grid spanning VMEM (78K/128) and HBM (492K/128, 625K/192,
  1302K/192) x pick in {tree (engine), take_along_axis}.
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

_U32 = jnp.uint32
rng = np.random.default_rng(0)
B, L = 1 << 20, 120
OUT = "/root/repo/.bench/probe75_session.jsonl"


def log(o):
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


def pick_take(counters, code, k):
    code = jnp.broadcast_to(code, counters.shape[:-1])
    return jnp.take_along_axis(
        counters, code[..., None].astype(jnp.int32), axis=-1
    )[..., 0]


def main():
    k, lut_m = 3, 12
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    tree = X._pick_counter
    for E, d in ((78_127, 128), (492_000, 128), (625_000, 192),
                 (1_302_085, 192)):
        tables = mk_tables(E, k, d, lut_m=lut_m)
        for name, pick in (("tree", tree), ("take", pick_take)):
            X._pick_counter = pick
            try:
                fn = jax.jit(
                    X.make_search_fn(k, d, False, layout="fused",
                                     lut_m=lut_m)
                )
                dt = timed(fn, tables, _U32(E * d - 8), q)
                log({"exp": "probe75", "E": E, "d": d, "pick": name,
                     "reads_per_s": round(B / dt)})
            except Exception as e:
                log({"exp": "probe75", "E": E, "d": d, "pick": name,
                     "err": str(e)[:300]})
            finally:
                X._pick_counter = tree
        del tables
    print("probe75 done", flush=True)


if __name__ == "__main__":
    main()

"""Probe 80: health-bracketed version of probe76 — is the fast-regime
round body gather-fusion-serialized?

Variants at the flagship shape (E=78127, k=3 d=128 lut12, 1M reads):
  A engine_fused     the engine as-is (gather fused into consumer)
  B barrier_split    jax.lax.optimization_barrier between gather and
                     consumer (forces a materialized row buffer and a
                     separate full-width consumer fusion)
  C gather_only      36-round dependent gather scan (row-derived index)
  D consumer_only    the full round body over a RESIDENT buffer
Each point is bracketed by the healthgate control; accepted only when
both controls are healthy (see probe79's rationale)."""

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
OUT = "/root/repo/.bench/probe80_session.jsonl"
k, d, lut_m, E = 3, 128, 12, 78_127
nb = d // 32
W = 2 * k * nb + 4**k


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


def barrier_gather(entries, block):
    return jax.lax.optimization_barrier(entries[block])


def main():
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    tables = mk_tables(E, k, d, lut_m=lut_m)
    bws = _U32(E * d - 8)
    ctl_fn = jax.jit(make_search_fn(k, d, False, layout="fused",
                                    lut_m=lut_m))

    def ctl():
        return B / timed(ctl_fn, tables, bws, q, it=2)

    fnb = jax.jit(make_search_fn(k, d, False, layout="fused", lut_m=lut_m,
                                 gather_fn=barrier_gather))

    idx0 = jnp.asarray(rng.integers(0, E + 1, size=(B, 2), dtype=np.uint32))
    code0 = jnp.asarray(rng.integers(0, 64, size=B, dtype=np.uint32))
    rows_buf = jax.device_put(jnp.asarray(
        rng.integers(0, 2**32, size=(B, 2, W), dtype=np.uint32)))

    @jax.jit
    def gather_only(entries, idx):
        def body(i, _):
            rows = entries[i]
            nxt = (rows[..., 0] + rows[..., W - 1]) % _U32(E + 1)
            return nxt, None
        out, _ = jax.lax.scan(body, idx, None, length=36)
        return out

    @jax.jit
    def consumer_only(rows, interval, code):
        def body(carry, _):
            interval, code = carry
            bmw = 2 * k * nb
            bm = rows[..., :bmw].reshape(rows.shape[:-1] + (k, 2, nb))
            cnt = X._pick_counter(rows[..., bmw:], code[:, None], k)
            masks = X._boundary_masks(interval % _U32(d), nb)
            matched = X._match_words(bm, code[:, None], k) & masks
            count = jnp.sum(jax.lax.population_count(matched), axis=-1)
            return (cnt + count, (code + _U32(1)) & _U32(63)), None
        (iv, _), _ = jax.lax.scan(body, (interval, code), None, length=36)
        return iv

    jobs = {
        "engine_fused": lambda: timed(ctl_fn, tables, bws, q),
        "barrier_split": lambda: timed(fnb, tables, bws, q),
        "gather_only_36r": lambda: timed(gather_only, tables["entries"],
                                         idx0),
        "consumer_only_36r": lambda: timed(consumer_only, rows_buf, idx0,
                                           code0),
    }
    done = set()
    deadline = time.time() + 3 * 3600
    while len(done) < len(jobs) and time.time() < deadline:
        c0 = ctl()
        log({"exp": "probe80_ctl", "reads_per_s": round(c0)})
        if c0 < HEALTHY:
            time.sleep(600)
            continue
        for name, job in jobs.items():
            if name in done:
                continue
            dt = job()
            c1 = ctl()
            rec = {"exp": "probe80", "variant": name, "secs": round(dt, 4),
                   "reads_per_s": round(B / dt),
                   "rows_per_s": round(36 * 2 * B / dt),
                   "ctl_after": round(c1), "accepted": c1 >= HEALTHY}
            log(rec)
            if c1 >= HEALTHY:
                done.add(name)
            else:
                break
    # bit-exactness of the barrier variant vs the engine (state-agnostic)
    a = np.asarray(jax.device_get(ctl_fn(tables, bws, q)))
    b = np.asarray(jax.device_get(fnb(tables, bws, q)))
    log({"exp": "probe80_exact", "barrier_vs_fused":
         bool(np.array_equal(a, b))})


if __name__ == "__main__":
    main()

"""Probe 76: is the fast-regime round body gather-fusion-serialized?

Healthy-flagship arithmetic: 13.9 ms/round for 2M rows, of which the pure
gather explains ~3.6 ms (556M rows/s VMEM-resident) — the fused consumer
(match/mask/popcount + tree pick, ~260 elem-ops/row = 520M elem-ops) takes
~10 ms, i.e. ~5% of VPU rate. Hypothesis: XLA interleaves the consumer
INTO the gather fusion per row-block, so consumer cost pays at the
gather's issue granularity instead of at full-width VPU rate.

Test: place jax.lax.optimization_barrier between the gather and the rest
of the round (forcing a materialized [B, 2, W] buffer and a SEPARATE
full-width consumer fusion), vs the engine's fused form — everything else
identical, fake tables, flagship shape (E=78127, k=3 d=128 lut12,
1M reads). Also time the round pieces alone (gather-only scan,
consumer-only scan on a resident buffer) for the cost model.

MSA caveat measured before (probe58): consumer shape changes can drop the
table off the VMEM fast path — the gather-only control detects that.
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
OUT = "/root/repo/.bench/probe76_session.jsonl"


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


def barrier_gather(entries, block):
    rows = entries[block]
    return jax.lax.optimization_barrier(rows)


def main():
    k, d, lut_m = 3, 128, 12
    E = 78_127
    tables = mk_tables(E, k, d, lut_m=lut_m)
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    bws = _U32(E * d - 8)

    # A. engine form (fused gather+consumer)
    fn = jax.jit(make_search_fn(k, d, False, layout="fused", lut_m=lut_m))
    dt = timed(fn, tables, bws, q)
    log({"exp": "probe76", "variant": "engine_fused", "secs": round(dt, 4),
         "reads_per_s": round(B / dt)})

    # B. barrier between gather and consumer (same search, gather_fn hook)
    fnb = jax.jit(make_search_fn(k, d, False, layout="fused", lut_m=lut_m,
                                 gather_fn=barrier_gather))
    dt = timed(fnb, tables, bws, q)
    out_a = np.asarray(jax.device_get(fn(tables, bws, q)))
    out_b = np.asarray(jax.device_get(fnb(tables, bws, q)))
    log({"exp": "probe76", "variant": "barrier_split", "secs": round(dt, 4),
         "reads_per_s": round(B / dt),
         "exact_vs_fused": bool(np.array_equal(out_a, out_b))})

    # C. gather-only dependent scan (36 rounds, index derived from row)
    W = 2 * k * (d // 32) + 4**k

    @jax.jit
    def gather_only(entries, idx0):
        def body(idx, _):
            rows = entries[idx]  # [B, 2, W]
            nxt = (rows[..., 0] + rows[..., W - 1]) % _U32(E + 1)
            return nxt, None
        out, _ = jax.lax.scan(body, idx0, None, length=36)
        return out

    idx0 = jnp.asarray(
        rng.integers(0, E + 1, size=(B, 2), dtype=np.uint32))
    dt = timed(gather_only, tables["entries"], idx0)
    log({"exp": "probe76", "variant": "gather_only_36r",
         "secs": round(dt, 4),
         "gather_rows_per_s": round(36 * 2 * B / dt)})

    # D. consumer-only: the full round body on a RESIDENT row buffer
    # (no gather) — what the split consumer costs at best
    rows_buf = jax.device_put(jnp.asarray(
        rng.integers(0, 2**32, size=(B, 2, W), dtype=np.uint32)))
    cfg = (k, d, d // 32)

    @jax.jit
    def consumer_only(rows, interval, code):
        def body(carry, _):
            interval, code = carry
            bmw = 2 * k * (d // 32)
            bm_rows = rows[..., :bmw].reshape(rows.shape[:-1]
                                              + (k, 2, d // 32))
            cnt = X._pick_counter(rows[..., bmw:], code[:, None], k)
            masks = X._boundary_masks(interval % _U32(d), d // 32)
            matched = X._match_words(bm_rows, code[:, None], k) & masks
            count = jnp.sum(jax.lax.population_count(matched), axis=-1)
            nxt = cnt + count
            return (nxt, (code + _U32(1)) & _U32(63)), None
        (iv, _), _ = jax.lax.scan(body, (interval, code), None, length=36)
        return iv

    code0 = jnp.asarray(rng.integers(0, 64, size=B, dtype=np.uint32))
    dt = timed(consumer_only, rows_buf, idx0, code0)
    log({"exp": "probe76", "variant": "consumer_only_36r",
         "secs": round(dt, 4),
         "consumer_rows_per_s": round(36 * 2 * B / dt)})
    print("probe76 done", flush=True)


if __name__ == "__main__":
    main()

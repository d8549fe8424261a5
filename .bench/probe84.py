"""Probe 84: decompose the Pallas round's 2x deficit (probe83: 1.07M
reads/s vs XLA 2.22M at the d=192 flagship).

Pieces, each timed standalone on [2M] flattened ends:
  a) gather-only: rows = entries[block]  (the known ~3.8 ms)
  b) xla-round: the full XLA round body on PRE-GATHERED rows
  c) pallas-round: lf_round (tree pick) on the same pre-gathered rows,
     tile in {2048}
  d) pallas-round-packed-out: same kernel but iv/code/out passed as
     [N/128, 128] lane-packed arrays, with the supported in-kernel
     packing reshapes where possible — only if (c) shows a boundary tax.
Bracketed with the fake-table flagship control.
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

from tpufm.engine.pallas_kernel import make_lf_round
from tpufm.engine.xla import make_search_fn

_U32 = jnp.uint32
_FULL = np.uint32(0xFFFFFFFF)
rng = np.random.default_rng(0)
B, L = 1 << 20, 120
N = 2 * B
HEALTHY = 1_200_000
OUT = "/root/repo/.bench/probe84_session.jsonl"


def log(o):
    o["t"] = round(time.time())
    print(json.dumps(o), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(o) + "\n")


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:8]))


def timed(f, *a, it=5):
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


def xla_round_body(k: int, d: int):
    """The round math of make_search_fn(layout='fused') lifted out: rows
    are an INPUT (no gather), matching engine/xla.py lf_step_fused
    semantics on flattened ends."""
    nb = d // 32

    def f(rows, iv, code, dpos, dbase, dblock):
        shift = (iv % _U32(d)).astype(jnp.int32)[:, None]
        win = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
        cov = jnp.clip(shift - 32 * win, 0, 32)
        amount = jnp.where(cov > 0, 32 - jnp.minimum(cov, 32), 0).astype(_U32)
        matched = jnp.where(cov > 0,
                            jnp.left_shift(_U32(_FULL), amount), _U32(0))
        for i in range(k):
            b0 = ((code >> _U32(2 * i)) & _U32(1))[:, None]
            b1 = ((code >> _U32(2 * i + 1)) & _U32(1))[:, None]
            p0 = rows[:, i * 2 * nb : i * 2 * nb + nb]
            p1 = rows[:, i * 2 * nb + nb : i * 2 * nb + 2 * nb]
            matched &= (jnp.where(b0 != 0, p0, ~p0)
                        & jnp.where(b1 != 0, p1, ~p1))
        count = jnp.sum(jax.lax.population_count(matched), axis=1)
        cnt_cols = rows[:, 2 * k * nb :]
        bits = (4**k).bit_length() - 1
        for bit in reversed(range(bits)):
            half = cnt_cols.shape[1] // 2
            hi = ((code >> _U32(bit)) & _U32(1))[:, None] != 0
            cnt_cols = jnp.where(hi, cnt_cols[:, half:], cnt_cols[:, :half])
        cnt = cnt_cols[:, 0]
        block = iv // _U32(d)
        for i in range(k):
            hit = (block == dblock[i]) & (code == dbase[i]) & (iv > dpos[i])
            count -= hit.astype(_U32)
        return cnt + count

    return f


def main():
    k, d, lut_m = 3, 192, 12
    E = 52_084
    nb = d // 32
    W = 2 * k * nb + 4**k
    span = E * d - 8
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    ctl_tab = mk_tables(78_127, 3, 128, lut_m=12)
    ctl_fn = jax.jit(make_search_fn(3, 128, False, layout="fused", lut_m=12))

    def ctl():
        return B / timed(ctl_fn, ctl_tab, _U32(78_127 * 128 - 8), q, it=2)

    tab = mk_tables(E, k, d)
    rows = jax.device_put(jnp.asarray(
        rng.integers(0, 2**32, size=(N, W), dtype=np.uint32)))
    iv = jax.device_put(jnp.asarray(
        rng.integers(0, span, size=N, dtype=np.uint32)))
    code = jax.device_put(jnp.asarray(
        rng.integers(0, 4**k, size=N, dtype=np.uint32)))
    dollar = jnp.stack([tab["dollar_pos"], tab["dollar_base"],
                        jnp.asarray(tab["dollar_block"], _U32)])

    c0 = ctl()
    log({"exp": "probe84_ctl", "reads_per_s": round(c0)})
    if c0 < HEALTHY:
        log({"exp": "probe84_abort", "why": "degraded"})
        return

    # (a) gather only
    gather = jax.jit(lambda ent, ivv: ent[ivv // _U32(d)])
    dt = timed(gather, tab["entries"], iv)
    log({"exp": "probe84", "piece": "gather_only", "ms": round(dt * 1e3, 3)})

    # (b) XLA round body on pre-gathered rows
    xr = jax.jit(xla_round_body(k, d))
    dt = timed(xr, rows, iv, code, tab["dollar_pos"], tab["dollar_base"],
               jnp.asarray(tab["dollar_block"], _U32))
    log({"exp": "probe84", "piece": "xla_round", "ms": round(dt * 1e3, 3)})

    # (c) pallas round kernel on the same rows
    for tile in (2048,):
        pk = jax.jit(
            lambda r, i_, c_, d_: make_lf_round(k, d, tile=tile)(r, i_, c_, d_),
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": 65536},
        )
        dt = timed(pk, rows, iv, code, dollar)
        log({"exp": "probe84", "piece": f"pallas_round_t{tile}",
             "ms": round(dt * 1e3, 3)})

    c1 = ctl()
    log({"exp": "probe84_ctl_after", "reads_per_s": round(c1),
         "accepted": c1 >= HEALTHY})


if __name__ == "__main__":
    main()

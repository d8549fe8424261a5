"""Probe 51b: valley bisection — which engine construct triggers it?

probe51 established: (B) the valley follows TABLE SIZE, not accessed
footprint; (C, caveat) a synthetic dependent-gather chain at E=312501 ran
at 90M rows/s — no valley — but that harness closed over the table, baking
it in as a jit CONSTANT (different compilation; also blew remote-compile at
E=1.3M). Here every table is a proper argument, and engine constructs are
added to the chain one at a time:

  s0 flat-chain:      idx [2B] -> rows -> next = rows[:,0] % E
  s1 2d-chain:        idx [B,2] (the engine's stacked-ends index shape)
  s2 + row compute:   mask/popcount/take_along_axis consumer (engine body
                      arithmetic, dollar fix) feeding next idx
  s3 full engine      (reference point, measured in probe51 B)

Each at E = 78127 (fast) and 312501 (valley), W=88, 36 rounds, 1M lanes.
Plus the D row-width scan (chain, table-as-arg) that probe51 never reached.
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

from tpufm.engine.xla import _boundary_masks, _match_words

_U32 = jnp.uint32
rng = np.random.default_rng(0)
B = 1 << 20
ROUNDS = 36
k, d = 3, 128
nb = d // 32
bmw = 2 * k * nb


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


def rec(**kw):
    print(json.dumps(kw), flush=True)
    with open("/root/repo/.bench/probe51_valley.jsonl", "a") as fh:
        fh.write(json.dumps(kw) + "\n")


def mk_table(E, W):
    t = rng.integers(0, 2**32, size=(E + 1, W), dtype=np.uint32)
    return jax.device_put(jnp.asarray(t))


def s0_flat(E, W):
    table = mk_table(E, W)
    idx0 = jnp.asarray(rng.integers(0, E, size=2 * B, dtype=np.uint32))

    def fn(table, i0):
        def body(idx, _):
            rows = table[idx]
            return rows[:, 0] % _U32(E), None

        return jax.lax.scan(body, i0, None, length=ROUNDS)[0]

    dt = timed(jax.jit(fn), table, idx0)
    return 2 * B * ROUNDS / dt


def s1_2d(E, W):
    table = mk_table(E, W)
    idx0 = jnp.asarray(rng.integers(0, E, size=(B, 2), dtype=np.uint32))

    def fn(table, i0):
        def body(idx, _):
            rows = table[idx]  # [B, 2, W]
            return rows[:, :, 0] % _U32(E), None

        return jax.lax.scan(body, i0, None, length=ROUNDS)[0]

    dt = timed(jax.jit(fn), table, idx0)
    return 2 * B * ROUNDS / dt


def s2_body(E, W):
    """2-D chain + the engine round's arithmetic consumer (mask, match,
    popcount, take_along_axis counter pick, dollar fix) feeding next idx."""
    table = mk_table(E, W)
    idx0 = jnp.asarray(rng.integers(0, E * d - 8, size=(B, 2), dtype=np.uint32))
    codes = jnp.asarray(rng.integers(0, 4**k, size=(ROUNDS, B), dtype=np.uint32))
    dollar_pos = jnp.zeros(k, _U32)
    dollar_base = jnp.full(k, 3, _U32)
    dollar_block = jnp.zeros(k, _U32)

    def fn(table, i0, codes):
        def body(interval, code):
            block = interval // _U32(d)
            rows = table[block]
            bm_rows = rows[..., :bmw].reshape(rows.shape[:-1] + (k, 2, nb))
            cnt = jnp.take_along_axis(
                rows[..., bmw:],
                (code[:, None, None] + _U32(0)).astype(jnp.int32),
                axis=-1,
            )[..., 0]
            masks = _boundary_masks(interval % _U32(d), nb)
            matched = _match_words(bm_rows, code[:, None], k) & masks
            count = jnp.sum(jax.lax.population_count(matched), axis=-1)
            hit = (
                (block[..., None] == dollar_block)
                & (code[:, None, None] == dollar_base)
                & (interval[..., None] > dollar_pos)
            )
            count -= jnp.sum(hit.astype(_U32), axis=-1)
            return (cnt + count) % _U32(E * d - 8), None

        return jax.lax.scan(body, i0, codes)[0]

    dt = timed(jax.jit(fn), table, idx0, codes)
    return 2 * B * ROUNDS / dt


W = bmw + 4**k  # 88
for E in (78_127, 312_501):
    rec(exp="E-bisect", stage="s0-flat-chain", E=E, W=W,
        rows_per_s=round(s0_flat(E, W)))
    rec(exp="E-bisect", stage="s1-2d-chain", E=E, W=W,
        rows_per_s=round(s1_2d(E, W)))
    rec(exp="E-bisect", stage="s2-body", E=E, W=W,
        rows_per_s=round(s2_body(E, W)))

# ---------- D: row-width scan (table-as-arg chain) ----------
for W_scan in (88, 112, 128, 160, 192, 224, 256, 288, 320):
    E = 78_127
    table = mk_table(E, W_scan)
    idx0 = jnp.asarray(rng.integers(0, E, size=2 * B, dtype=np.uint32))

    def fn(table, i0):
        def body(idx, _):
            rows = table[idx]
            return rows[:, 0] % _U32(E), None

        return jax.lax.scan(body, i0, None, length=ROUNDS)[0]

    dt = timed(jax.jit(fn), table, idx0)
    rec(exp="D-width", E=E, W=W_scan,
        chain_rows_per_s=round(2 * B * ROUNDS / dt))
    del table

print("probe51b done", flush=True)

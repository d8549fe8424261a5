"""Probe 58: paired-table search with the FULL engine body.

probe57's chain consumed only rows[:,0] (XLA may simplify the gather), so
its 235M rows/s paired-table teaser is untrusted. Here every variant runs
the real round arithmetic (mask/match/popcount/counter-select/dollar fix)
and feeds the next interval from cnt+count — engine-shaped work:

  v0 standard: [B,2] block indices, one 88-word gather per END (flagship
     formulation; sanity: should be ~87M rows/s = 1.21M reads/s).
  v1 flat: same but indices flattened to [2B] (does 2-D index shape cost?)
  v2 paired: doubled table [E+1, 176] (row i = rows i||i+1), ONE gather
     per READ at block_lo; hi row selected in-register from the two
     halves (valid when block_hi - block_lo <= 1 — emulated by keeping
     interval widths < d, the post-LUT regime of every real search).

All fake tables, bounded counters, E=78127 d=128 (VMEM regime; paired
table is 80 MB — still VMEM-eligible), 1M reads, 36 rounds.
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
B, ROUNDS, k, d = 1 << 20, 36, 3, 128
nb = d // 32
bmw = 2 * k * nb
W = bmw + 64
E = 78_127
BWT = E * d - 8


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


# Bounded counters so intervals stay in range; narrow spread so emulated
# widths stay < d (cnt in [0, BWT-2d); count adds < d).
ent = rng.integers(0, 2**32, size=(E + 1, W), dtype=np.uint32)
ent[:, bmw:] = rng.integers(0, BWT - 2 * d, size=(E + 1, 64), dtype=np.uint32)
codes_np = rng.integers(0, 64, size=(ROUNDS, B), dtype=np.uint32)
codes = jnp.asarray(codes_np)
dollar = (jnp.zeros(k, _U32), jnp.full(k, 3, _U32), jnp.zeros(k, _U32))


def body_math(rows, code_b, interval, block):
    """Full engine round arithmetic on gathered rows [..., W].
    code_b has block.shape (already broadcast per end)."""
    bm_rows = rows[..., :bmw].reshape(rows.shape[:-1] + (k, 2, nb))
    cnt = jnp.take_along_axis(
        rows[..., bmw:], (code_b[..., None] + _U32(0)).astype(jnp.int32), axis=-1
    )[..., 0]
    masks = _boundary_masks(interval % _U32(d), nb)
    matched = _match_words(bm_rows, code_b, k) & masks
    count = jnp.sum(jax.lax.population_count(matched), axis=-1)
    dpos, dbase, dblock = dollar
    hit = (
        (block[..., None] == dblock)
        & (code_b[..., None] == dbase)
        & (interval[..., None] > dpos)
    )
    count -= jnp.sum(hit.astype(_U32), axis=-1)
    return cnt + count


table = jax.device_put(jnp.asarray(ent))


def v0_standard(table, codes):
    iv0 = jnp.stack(
        [jnp.zeros(B, _U32), jnp.full(B, _U32(97), _U32)], axis=1
    ) + jnp.arange(B, dtype=_U32)[:, None] % _U32(BWT - 2 * d)

    def round_(iv, code):
        block = iv // _U32(d)
        rows = table[block]  # [B, 2, W]
        nxt = body_math(rows, jnp.broadcast_to(code[:, None], block.shape), iv, block)
        # keep widths small: force hi = lo + small
        lo = nxt[:, 0] % _U32(BWT - 2 * d)
        return jnp.stack([lo, lo + (nxt[:, 1] % _U32(97))], axis=1), None

    return jax.lax.scan(round_, iv0, codes)[0]


def v1_flat(table, codes):
    iv0 = (jnp.arange(2 * B, dtype=_U32) * _U32(7919)) % _U32(BWT - 2 * d)

    def round_(iv, code):
        block = iv // _U32(d)
        rows = table[block]  # [2B, W]
        code2 = jnp.concatenate([code, code])
        nxt = body_math(rows, code2, iv, block)
        return nxt % _U32(BWT - 2 * d), None

    return jax.lax.scan(round_, iv0, codes)[0]


pt = np.concatenate([ent[:-1], ent[1:]], axis=1)
pt = np.concatenate([pt, np.zeros((1, 2 * W), np.uint32)])  # sentinel pair
paired = jax.device_put(jnp.asarray(pt))
del pt


def v2_paired(paired, codes):
    lo0 = jnp.arange(B, dtype=_U32) % _U32(BWT - 2 * d)
    iv0 = jnp.stack([lo0, lo0 + _U32(97)], axis=1)

    def round_(iv, code):
        block = iv // _U32(d)  # [B, 2]
        start = block[:, 0]
        prow = paired[start]  # [B, 2W] — ONE gather per read
        sel = (block[:, 1] - start).astype(bool)  # 0 or 1
        rows = jnp.stack(
            [
                prow[:, :W],
                jnp.where(sel[:, None], prow[:, W:], prow[:, :W]),
            ],
            axis=1,
        )  # [B, 2, W]
        nxt = body_math(rows, jnp.broadcast_to(code[:, None], block.shape), iv, block)
        lo = nxt[:, 0] % _U32(BWT - 2 * d)
        return jnp.stack([lo, lo + (nxt[:, 1] % _U32(97))], axis=1), None

    return jax.lax.scan(round_, iv0, codes)[0]


for name, fn, args, rows_per_read in (
    ("v0-standard", v0_standard, (table, codes), 72),
    ("v1-flat", v1_flat, (table, codes), 72),
    ("v2-paired", v2_paired, (paired, codes), 36),
):
    dt = timed(jax.jit(fn), *args)
    rec(exp="L-paired-body", variant=name,
        seconds=dt, reads_per_s=round(B / dt),
        gather_rows_per_s=round(B * ROUNDS * (rows_per_read / 36) / dt))

print("probe58 done", flush=True)

"""Probe 63: counter-pick variants beyond take_along_axis (round-3 headroom).

The trace (probe52) shows the fast-regime flagship spends 420 ms/pass in the
take_along_axis counter pick vs 136 ms in the table gather. probe61/62
refuted the split layout and a second scalar gather; this probe measures the
remaining in-register formulations, each monkeypatched into lf_step_fused so
every other byte of the program (and MSA's view of it) matches the engine:

- hier:  two-stage one-hot (8x8 group/element) — O(2*sqrt(N)) predicated
         sums instead of the full 64-wide one-hot (which was 2.2x slower).
- tree:  binary tree select — log2(64)=6 levels of halving where()s.
- flat:  take_along_axis over the flattened [B, 2W] row (different fusion
         shape, same semantics).
- base:  unpatched control, same session.
"""

import json
import sys

sys.path.insert(0, "/root/repo")
from tpufm.bench import _enable_compile_cache

_enable_compile_cache()

import jax
import jax.numpy as jnp

import tpufm.engine.xla as X
from tpufm.engine.xla import _boundary_masks, _match_words

_U32 = jnp.uint32


def _make_variant(pick):
    def lf_step(tables, cfg, interval, code, gather_fn=None):
        k, d, nb = cfg
        bmw = 2 * k * nb
        block = interval // _U32(d)
        rows = tables["entries"][block]  # [B, 2, W]
        bm_rows = rows[..., :bmw].reshape(rows.shape[:-1] + (k, 2, nb))
        cnt = pick(rows, bmw, code, k)

        masks = _boundary_masks(interval % _U32(d), nb)
        matched = _match_words(bm_rows, code[:, None], k) & masks
        count = jnp.sum(jax.lax.population_count(matched), axis=-1)

        dpos, dbase, dblock = (
            tables["dollar_pos"],
            tables["dollar_base"],
            tables["dollar_block"],
        )
        hit = (
            (block[..., None] == dblock)
            & (code[:, None, None] == dbase)
            & (interval[..., None] > dpos)
        )
        count -= jnp.sum(hit.astype(_U32), axis=-1)
        return cnt + count

    return lf_step


def pick_base(rows, bmw, code, k):
    return jnp.take_along_axis(
        rows[..., bmw:], (code[:, None, None] + _U32(0)).astype(jnp.int32), axis=-1
    )[..., 0]


def pick_hier(rows, bmw, code, k):
    n = 4 ** k
    g = 1 << ((n.bit_length() - 1) // 2)  # group count (8 at k=3)
    s = n // g
    c = rows[..., bmw:].reshape(rows.shape[:-1] + (g, s))  # [B,2,g,s]
    gi = jax.lax.broadcasted_iota(jnp.int32, c.shape, c.ndim - 2)
    gidx = (code // _U32(s)).astype(jnp.int32)[:, None, None, None]
    grp = jnp.sum(jnp.where(gi == gidx, c, _U32(0)), axis=-2)  # [B,2,s]
    si = jax.lax.broadcasted_iota(jnp.int32, grp.shape, grp.ndim - 1)
    sidx = (code % _U32(s)).astype(jnp.int32)[:, None, None]
    return jnp.sum(jnp.where(si == sidx, grp, _U32(0)), axis=-1)


def pick_tree(rows, bmw, code, k):
    c = rows[..., bmw:]  # [B,2,4^k]
    bits = (4 ** k).bit_length() - 1
    for bit in reversed(range(bits)):
        half = c.shape[-1] // 2
        hi = ((code >> _U32(bit)) & _U32(1)) != 0  # [B]
        c = jnp.where(hi[:, None, None], c[..., half:], c[..., :half])
    return c[..., 0]


def pick_flat(rows, bmw, code, k):
    B = rows.shape[0]
    W = rows.shape[-1]
    rf = rows.reshape(B, 2 * W)
    idx = jnp.stack(
        [_U32(bmw) + code, _U32(W + bmw) + code], axis=1
    ).astype(jnp.int32)
    return jnp.take_along_axis(rf, idx, axis=1)


VARIANTS = {
    "hier": pick_hier,
    "tree": pick_tree,
    "flat": pick_flat,
    "base": pick_base,
}

if __name__ == "__main__":
    from tpufm.bench import run_bench

    orig = X.lf_step_fused
    which = sys.argv[1:] or list(VARIANTS)
    for name in which:
        X.lf_step_fused = _make_variant(VARIANTS[name])
        rec = run_bench(
            refsize=10_000_000, k=3, d=128, num_queries=1 << 20,
            query_len=120, iterations=3, engine="xla", lut_m=12,
            compare_reference=False,
        )
        X.lf_step_fused = orig
        out = {
            "exp": "M-counterpick63", "variant": name,
            "reads_per_s": rec["detail"]["reads_per_s"],
            "exact": rec["detail"]["bit_exact_vs_oracle"],
        }
        print(json.dumps(out), flush=True)
        with open("/root/repo/.bench/probe63_counterpick.jsonl", "a") as fh:
            fh.write(json.dumps(out) + "\n")
    print("probe63 done", flush=True)

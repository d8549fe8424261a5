"""Probe 62: counter pick via scalar gather instead of take_along_axis.

The round-3 trace shows the fast-regime flagship spends 420 ms/pass in the
take_along_axis counter pick (fusion.38) vs 136 ms in the table gather
itself. Variant: fetch the counter with a SECOND scalar gather against the
same (VMEM-resident) entries table — entries[block, bmw + code] — which
rides the fast gather mechanism instead of the slow in-row dynamic select.

Implemented by monkeypatching lf_step_fused so every other byte of the
program (and MSA's view of it) matches the real engine.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
from tpufm.bench import _enable_compile_cache

_enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

import tpufm.engine.xla as X
from tpufm.engine.xla import _boundary_masks, _match_words

_U32 = jnp.uint32


def lf_step_fused_scalar(tables, cfg, interval, code, gather_fn=None):
    k, d, nb = cfg
    bmw = 2 * k * nb
    block = interval // _U32(d)
    rows = tables["entries"][block]  # [B, 2, W]
    bm_rows = rows[..., :bmw].reshape(rows.shape[:-1] + (k, 2, nb))
    # THE CHANGE: scalar gather from the table, not in-row dynamic select
    cnt = tables["entries"][
        block, (_U32(bmw) + code[:, None]).astype(jnp.int32)
    ]

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


X.lf_step_fused = lf_step_fused_scalar
variant = "scalar-gather"  # baseline = 1.211M (probe59, same session)
if True:
    from tpufm.bench import run_bench

    rec = run_bench(
        refsize=10_000_000, k=3, d=128, num_queries=1 << 20,
        query_len=120, iterations=3, engine="xla", lut_m=12,
        compare_reference=False,
    )
    out = {
        "exp": "M-counterpick", "variant": variant,
        "reads_per_s": rec["detail"]["reads_per_s"],
        "exact": rec["detail"]["bit_exact_vs_oracle"],
    }
    print(json.dumps(out), flush=True)
    with open("/root/repo/.bench/probe51_valley.jsonl", "a") as fh:
        fh.write(json.dumps(out) + "\n")
print("probe62 done", flush=True)

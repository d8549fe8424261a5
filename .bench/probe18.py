"""Probe 18: compare compiled HLO (gather op + allocations) between a fast
point (E=78000, k=3 d=128) and a slow point (E=312000, same)."""
import os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from tpufm.engine.xla import make_search_fn

rng = np.random.default_rng(0)
B, L, k, d = 2**19, 120, 3, 128

def build(E):
    nb = d // 32
    W = 2 * k * nb + 4**k
    ent = jnp.asarray(rng.integers(0, 2**32, size=(E + 1, W), dtype=np.uint32))
    tables = {
        "entries": ent,
        "dollar_pos": jnp.zeros(k, jnp.uint32),
        "dollar_base": jnp.full(k, 3, jnp.uint32),
        "dollar_block": jnp.zeros(k, jnp.uint32),
    }
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    fn = jax.jit(make_search_fn(k, d, False, layout="fused"))
    return fn.lower(tables, jnp.uint32(E * d - 7), q).compile().as_text()

import re
for E in (78_000, 312_000):
    txt = build(E)
    print(f"===== E={E} =====", flush=True)
    for line in txt.splitlines():
        if ("gather(" in line or "copy(" in line or "dynamic-slice(" in line) and "fusion" not in line:
            print("  " + line.split(" metadata")[0].strip()[:230], flush=True)

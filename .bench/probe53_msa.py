"""Probe 53: MSA (memory-space-assignment) valley fix test.

probe51's executable diff found the fast-path mechanism: XLA MSA prefetches
the whole entries table into VMEM (S(1)) inside the scan loop when it fits
the MSA budget (~74-88 MB observed boundary); valley tables (88-140 MB)
gather from HBM at ~51M rows/s instead of ~87M.

libtpu exposes --xla_vf_max_vmem_used_by_memory_space_assignment. If
raising it flips a 110 MB table back to VMEM residency, the 30-200 Mbase
valley is FIXED, not just diagnosed.

Usage: probe53_msa.py <label> <E> <d> <lut_m> [<msa_bytes>]
(one process per config — XLA debug options are read at first use).
"""

import json
import os
import sys
import time

label, E, d, lut_m = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
msa = int(sys.argv[5]) if len(sys.argv) > 5 else 0
if msa:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_vf_max_vmem_used_by_memory_space_assignment={msa}"
    ).strip()

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tpufm.engine.xla import make_search_fn

_U32 = jnp.uint32
rng = np.random.default_rng(0)
B, L, k = 1 << 20, 120, 3
nb = d // 32
W = 2 * k * nb + 4**k


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


ent = rng.integers(0, 2**32, size=(E + 1, W), dtype=np.uint32)
ent[:, 2 * k * nb :] = rng.integers(0, E * d - 8, size=(E + 1, 4**k), dtype=np.uint32)
tables = {
    "entries": jax.device_put(jnp.asarray(ent)),
    "dollar_pos": jnp.zeros(k, _U32),
    "dollar_base": jnp.full(k, 3, _U32),
    "dollar_block": jnp.zeros(k, _U32),
}
if lut_m:
    tables["lut"] = jax.device_put(
        jnp.asarray(
            rng.integers(0, E * d - 8, size=(4**lut_m, 2), dtype=np.uint32)
        )
    )
fn = jax.jit(make_search_fn(k, d, False, layout="fused", lut_m=lut_m))
q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
try:
    dt = timed(fn, tables, _U32(E * d - 8), q)
    rec = {
        "exp": "F-msa", "label": label, "E": E, "d": d, "lut_m": lut_m,
        "msa_bytes": msa, "table_mb": round((E + 1) * W * 4 / 1e6, 1),
        "reads_per_s": round(B / dt),
    }
except Exception as e:  # noqa: BLE001
    rec = {"exp": "F-msa", "label": label, "E": E, "d": d, "lut_m": lut_m,
           "msa_bytes": msa, "error": repr(e)[:300]}
print(json.dumps(rec), flush=True)
with open("/root/repo/.bench/probe51_valley.jsonl", "a") as fh:
    fh.write(json.dumps(rec) + "\n")

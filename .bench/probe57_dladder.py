"""Probe 57: extend the VMEM fast path with larger d + pin the width cliff.

The MSA/VMEM diagnosis says the fast path needs table bytes under ~93 MB.
Table bytes at k=3: 0.75*R (bitmaps) + 1024*R/d (counters), so larger d
shrinks the table: d=256 fits ~53 Mbase, d=320 ~60M, d=448 ~70M, d=960
~91M. But wider rows (d/32*6 + 64 words) may fall off the gather width
cliff (87M rows/s at <=112 words, 30-44M at >=280). Measure the full
flagship fn (fake tables, lut12, 1M reads) on the d ladder at refsizes
just inside each d's VMEM boundary, plus the chain width scan.
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

from tpufm.engine.xla import make_search_fn

_U32 = jnp.uint32
rng = np.random.default_rng(0)
B, L, k = 1 << 20, 120, 3


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


def flagship(E, d, lut_m=12):
    nb = d // 32
    W = 2 * k * nb + 4**k
    ent = rng.integers(0, 2**32, size=(E + 1, W), dtype=np.uint32)
    ent[:, 2 * k * nb :] = rng.integers(
        0, E * d - 8, size=(E + 1, 4**k), dtype=np.uint32
    )
    tables = {
        "entries": jax.device_put(jnp.asarray(ent)),
        "dollar_pos": jnp.zeros(k, _U32),
        "dollar_base": jnp.full(k, 3, _U32),
        "dollar_block": jnp.zeros(k, _U32),
        "lut": jax.device_put(
            jnp.asarray(
                rng.integers(0, E * d - 8, size=(4**lut_m, 2), dtype=np.uint32)
            )
        ),
    }
    fn = jax.jit(make_search_fn(k, d, False, layout="fused", lut_m=lut_m))
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    dt = timed(fn, tables, _U32(E * d - 8), q)
    del tables
    return B / dt


# ---- Width scan + paired-table test (chain harness, table as arg) ----
# probe55's lax.gather slice_sizes=(2,W) COMPILE HANGS on this TPU stack
# (killed after 21 min) — the paired-row idea is instead expressed as a
# doubled-width table (row i = rows i||i+1) + ONE standard row gather per
# READ. Whether it wins is exactly the row-width question.
ROUNDS = 36


def chain_rate(E, W, n_lanes):
    table = jax.device_put(
        jnp.asarray(rng.integers(0, E, size=(E + 1, W), dtype=np.uint32))
    )
    idx0 = jnp.asarray(rng.integers(0, E, size=n_lanes, dtype=np.uint32))

    def fn(table, i0):
        def body(idx, _):
            rows = table[idx]
            return rows[:, 0] % _U32(E), None

        return jax.lax.scan(body, i0, None, length=ROUNDS)[0]

    dt = timed(jax.jit(fn), table, idx0)
    del table
    return n_lanes * ROUNDS / dt


for W_scan in (88, 128, 176, 224, 288):
    r = chain_rate(78_127, W_scan, 2 << 20)
    rec(exp="D-width", E=78_127, W=W_scan, lanes=2 << 20,
        chain_rows_per_s=round(r))

# Paired-table at 1M lanes (one slice per READ) vs standard at 2M lanes
# (one row per END): reads/s equivalents for the flagship round count.
r_paired = chain_rate(78_127, 176, 1 << 20)
r_std = chain_rate(78_127, 88, 2 << 20)
rec(exp="I-paired-table", E=78_127,
    paired_rows_per_s=round(r_paired),
    standard_rows_per_s=round(r_std),
    reads_per_s_if_paired=round(r_paired / ROUNDS),
    reads_per_s_if_standard=round(r_std / (2 * ROUNDS)))

# d ladder at refsizes just inside each d's VMEM budget (and one outside)
CASES = [
    # (refsize, d) — table_mb = (R/d)*(0.75d+1024)/1e6... computed in rec
    (50_000_000, 256),
    (60_000_000, 320),
    (70_000_000, 448),
    (90_000_000, 960),
    (60_000_000, 256),   # just OVER d=256's boundary — control
]
for R, d in CASES:
    E = -(-R // d)
    W = 2 * k * (d // 32) + 64
    r = flagship(E, d)
    rec(exp="K-dladder", refsize=R, d=d, E=E, W=W,
        table_mb=round((E + 1) * W * 4 / 1e6, 1), reads_per_s=round(r))

print("probe57 done", flush=True)

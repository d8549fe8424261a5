"""Probe 51 (round 3): valley diagnosis at the runtime level.

VERDICT round-2 item 3: the 30-200 Mbase "valley" (~700K vs 1.22M reads/s)
was called "an opaque property of the XLA gather runtime" without comparing
the compiled executables of a fast vs valley FULL flagship program.

Experiments (all fake tables — value distribution measured irrelevant):
A. Compile the FULL flagship program (k=3 d=128 fused + lut12, 1M reads)
   at E=78127 (10 Mbase, fast) and E=312501 (40 Mbase, valley); save the
   complete optimized-HLO executables and structurally diff them with all
   E-derived constants normalized. Repeat at d=192 for E=328126 (63 Mbase,
   valley) vs E=1302085 (250 Mbase, fast) — same row width, same program,
   only E differs, and the big one is FAST (the non-monotonicity witness).
B. Footprint vs table-size: valley-size and big tables whose CONTENTS
   confine every visited block to a window of the fast size (first 78127
   rows / a middle window). If confinement restores the fast rate, the
   mechanism is access-footprint-dependent (runtime memory system); if
   not, it is table-size-dependent (allocation/compiled config).
C. Construct triangulation at each E: (1) one flat batched gather
   [2M rows], (2) a 36-round dependent-gather scan (row-derived next
   index), (3) the full engine — which construct carries the slowdown?
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpufm.engine.xla import make_search_fn

_U32 = jnp.uint32
rng = np.random.default_rng(0)
B, L = 1 << 20, 120


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


def mk_tables(E, k, d, limit=None, lo=0, lut_m=0):
    """Fake fused tables of E+1 rows; counter/lut values confined to blocks
    [lo, lo+limit) (limit=None -> full range)."""
    nb = d // 32
    W = 2 * k * nb + 4**k
    span = (limit if limit is not None else E) * d - 8
    ent = rng.integers(0, 2**32, size=(E + 1, W), dtype=np.uint32)
    ent[:, 2 * k * nb :] = rng.integers(
        lo * d, lo * d + span, size=(E + 1, 4**k), dtype=np.uint32
    )
    tables = {
        "entries": jax.device_put(jnp.asarray(ent)),
        "dollar_pos": jnp.zeros(k, _U32),
        "dollar_base": jnp.full(k, 3, _U32),
        "dollar_block": jnp.zeros(k, _U32),
    }
    if lut_m:
        lut = rng.integers(
            lo * d, lo * d + span, size=(4**lut_m, 2), dtype=np.uint32
        )
        tables["lut"] = jax.device_put(jnp.asarray(lut))
    return tables


def flagship_rate(E, k, d, lut_m, limit=None, lo=0):
    tables = mk_tables(E, k, d, limit=limit, lo=lo, lut_m=lut_m)
    fn = jax.jit(make_search_fn(k, d, False, layout="fused", lut_m=lut_m))
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    dt = timed(fn, tables, _U32(E * d - 8), q)
    del tables
    return B / dt


def save_executable(E, k, d, lut_m, path):
    tables = mk_tables(E, k, d, lut_m=lut_m)
    fn = jax.jit(make_search_fn(k, d, False, layout="fused", lut_m=lut_m))
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    txt = fn.lower(tables, _U32(E * d - 8), q).compile().as_text()
    open(path, "w").write(txt)
    del tables
    return txt


def normalize(txt, E):
    # Replace every E-derived integer with a symbol so the diff shows only
    # STRUCTURAL differences (op choice, fusion, layout, backend config).
    for v, s in ((E + 1, "EP1"), (E, "E"), (E * 128 - 8, "BWT"), (E * 192 - 8, "BWT")):
        txt = re.sub(rf"\b{v}\b", s, txt)
    return txt


results = []


def rec(**kw):
    results.append(kw)
    print(json.dumps(kw), flush=True)
    with open("/root/repo/.bench/probe51_valley.jsonl", "a") as fh:
        fh.write(json.dumps(kw) + "\n")


# ---------- A: full-executable diff ----------
PAIRS = [
    (3, 128, 12, 78_127, 312_501),     # fast vs valley, d=128
    (3, 192, 12, 1_302_085, 328_126),  # FAST-big vs valley, d=192
]
for k, d, lut_m, E_fast, E_valley in PAIRS:
    t_fast = save_executable(
        E_fast, k, d, lut_m, f"/root/repo/.bench/exec_E{E_fast}_d{d}.hlo"
    )
    t_valley = save_executable(
        E_valley, k, d, lut_m, f"/root/repo/.bench/exec_E{E_valley}_d{d}.hlo"
    )
    nf = normalize(t_fast, E_fast).splitlines()
    nv = normalize(t_valley, E_valley).splitlines()
    import difflib

    diff = [
        l
        for l in difflib.unified_diff(nf, nv, lineterm="", n=0)
        if l.startswith(("+", "-")) and not l.startswith(("+++", "---"))
    ]
    rec(
        exp="A-exec-diff", d=d, E_fast=E_fast, E_valley=E_valley,
        lines_fast=len(nf), lines_valley=len(nv), diff_lines=len(diff),
        diff_sample=diff[:40],
    )

# ---------- B: footprint vs table size ----------
for k, d, lut_m, E_small, E_mid, E_big in [(3, 128, 12, 78_127, 312_501, 1_302_085)]:
    for label, E, limit, lo in [
        ("fast-baseline", E_small, None, 0),
        ("valley-baseline", E_mid, None, 0),
        ("valley-table-fast-footprint", E_mid, E_small, 0),
        ("valley-table-fast-footprint-offset", E_mid, E_small, E_mid - E_small - 1),
        ("big-table-baseline", E_big, None, 0),
        ("big-table-valley-footprint", E_big, E_mid, 0),
        ("big-table-fast-footprint", E_big, E_small, 0),
    ]:
        r = flagship_rate(E, k, d, lut_m, limit=limit, lo=lo)
        rec(exp="B-footprint", d=d, label=label, E=E,
            footprint_rows=limit or E, offset=lo, reads_per_s=round(r))

# ---------- C: construct triangulation ----------
def pure_gather_rate(E, W, n_idx, limit):
    table = jax.device_put(
        jnp.asarray(rng.integers(0, 2**32, size=(E + 1, W), dtype=np.uint32))
    )
    idx = jnp.asarray(rng.integers(0, limit, size=n_idx, dtype=np.int32))
    fn = jax.jit(lambda t, i: t[i].sum(axis=-1, dtype=jnp.uint32))
    dt = timed(fn, table, idx)
    del table
    return n_idx / dt


def chain_gather_rate(E, W, n_lanes, rounds, limit):
    table = jax.device_put(
        jnp.asarray(rng.integers(0, limit, size=(E + 1, W), dtype=np.uint32))
    )
    idx0 = jnp.asarray(rng.integers(0, limit, size=n_lanes, dtype=np.uint32))

    def body(idx, _):
        rows = table[idx]          # dependent gather
        nxt = rows[:, 0] % _U32(limit)
        return nxt, None

    fn = jax.jit(lambda i0: jax.lax.scan(body, i0, None, length=rounds)[0])
    dt = timed(fn, idx0)
    del table
    return n_lanes * rounds / dt


W = 2 * 3 * 4 + 64  # d=128 k=3 fused row width
for E in (78_127, 312_501, 1_302_085):
    g1 = pure_gather_rate(E, W, 2 << 20, E)
    g2 = chain_gather_rate(E, W, 2 << 20, 36, E)
    rec(exp="C-construct", E=E, W=W,
        pure_gather_rows_per_s=round(g1),
        chain_gather_rows_per_s=round(g2))

# ---------- D: row-width cliff (the high-k killer, probe50) ----------
# k=3 fused rows (88-112 words) gather at ~87M rows/s; k=4 rows (280-304
# words) at 30-44M. Where is the cliff? The narrowest possible k=4 fused
# row is 264 words (4^4 counters + 8 bitmap words) — if the cliff sits
# below that, fused high-k is structurally dead on this gather.
for W_scan in (88, 112, 128, 160, 192, 224, 256, 288, 320):
    g = chain_gather_rate(78_127, W_scan, 2 << 20, 36, 78_127)
    rec(exp="D-width", E=78_127, W=W_scan,
        chain_gather_rows_per_s=round(g))

print("probe51 done", flush=True)

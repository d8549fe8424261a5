"""Probe 54: does REAL query structure lift the over-budget (HBM) gather?

probe53: fake 250M d=192 = 701K reads/s, but round 2 measured the REAL
250M/3G indexes at 1.05-1.08M. Real searches differ from the fake harness
in one structural way: intervals NARROW as the search proceeds, so the two
stacked interval ends land in the same entry row for most rounds —
duplicate gather indices (DRAM row-buffer hits / gather coalescing).

a. REAL 63 Mbase index, d=192 + lut12 (131 MB, over VMEM budget): if this
   runs ~1.05M, the "valley" does not exist for real workloads at d=192
   and recommend_config should switch to d=192 beyond the VMEM boundary.
b. REAL 63 Mbase, d=128 + lut12 (real-data valley control).
c/d. Fake 2-D chain at the same E with DUPLICATED vs INDEPENDENT index
   pairs — the isolated mechanism test.
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

from tpufm.config import IndexConfig
from tpufm.engine.oracle import search_oracle
from tpufm.engine.xla import XLAEngine
from tpufm.index.builder import build_index
from tpufm.io.genreads import generate_reads

_U32 = jnp.uint32
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


def rec(**kw):
    print(json.dumps(kw), flush=True)
    with open("/root/repo/.bench/probe51_valley.jsonl", "a") as fh:
        fh.write(json.dumps(kw) + "\n")


REFSIZE = 63_000_000
rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=REFSIZE, dtype=np.uint8)
queries = generate_reads(codes, L, B, seed=1)
vidx = np.sort(np.random.default_rng(2).choice(B, 2048, replace=False))

for d in (192, 128):
    t0 = time.perf_counter()
    index = build_index(codes, IndexConfig(k=3, d=d))
    print(f"built 63M d={d} in {time.perf_counter()-t0:.0f}s", flush=True)
    eng = XLAEngine(index, lut_m=12)
    qd = jax.device_put(jnp.asarray(queries, jnp.uint8))
    dt = timed(lambda: eng.search_device(qd))
    out = np.asarray(jax.device_get(eng.search_device(qd)))
    exact = bool((out[vidx] == search_oracle(index, queries[vidx])).all())
    rec(exp="G-real63M", d=d, E=index.nentries,
        table_mb=round(eng.tables["entries"].nbytes / 1e6, 1),
        reads_per_s=round(B / dt), bit_exact=exact)
    del eng, index, qd

# c/d: isolated duplicate-index mechanism test (fake chain, table as arg)
ROUNDS = 36
for d, E in ((192, 328_126), (128, 312_501)):
    nb = d // 32
    W = 2 * 3 * nb + 64
    table = jax.device_put(
        jnp.asarray(rng.integers(0, E, size=(E + 1, W), dtype=np.uint32))
    )

    def fn(table, i0):
        def body(idx, _):
            rows = table[idx]  # [B, 2, W]
            return rows[:, :, 0] % _U32(E), None

        return jax.lax.scan(body, i0, None, length=ROUNDS)[0]

    jfn = jax.jit(fn)
    idx_rand = jnp.asarray(rng.integers(0, E, size=(B, 2), dtype=np.uint32))
    one = rng.integers(0, E, size=(B, 1), dtype=np.uint32)
    idx_dup = jnp.asarray(np.concatenate([one, one], axis=1))
    # NB: with dup pairs the chain PRESERVES duplication (both lanes read
    # the same row -> same next index), modeling the narrowed-interval
    # regime of a real search.
    r_rand = 2 * B * ROUNDS / timed(jfn, table, idx_rand)
    r_dup = 2 * B * ROUNDS / timed(jfn, table, idx_dup)
    rec(exp="H-dup", d=d, E=E, W=W,
        chain_rows_per_s_random=round(r_rand),
        chain_rows_per_s_duplicated=round(r_dup))
    del table

print("probe54 done", flush=True)

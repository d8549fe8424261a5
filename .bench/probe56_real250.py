"""Probe 56: re-measure the committed REAL 250M index (round-2 artifact)
and bisect real-vs-fake table differences in ONE process.

Round-2 probes 27+30 measured real 250M d=192 at 1.082-1.086M reads/s at
1M-read waves; probe53 (fresh fake table, same E/W/program) measures 701K,
and today's real 63M = 701K. Either the round-2 number depended on table
CONTENT (disproved for value-distribution in r2 — retest at this E), or on
process/environment state. Load .bench/idx250m.npz and measure:
  a. real entries + real LUT (reproduces r2?)
  b. fake entries, same shapes (same process, same query batch)
  c. real entries with counters column-shuffled (content structure probe)
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

from tpufm.engine.xla import XLAEngine, make_search_fn
from tpufm.index.formats import load_npz

_U32 = jnp.uint32
B, L, lut_m = 1 << 20, 120, 12


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


t0 = time.perf_counter()
index = load_npz("/root/repo/.bench/idx250m.npz")
print(f"loaded real 250M index in {time.perf_counter()-t0:.0f}s "
      f"(k={index.config.k} d={index.config.d} E={index.nentries})", flush=True)
k, d = index.config.k, index.config.d

rng = np.random.default_rng(0)
q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))

eng = XLAEngine(index, lut_m=lut_m,
                lut_cache="/root/repo/.bench/idx250m.lut12.npz")
fn = jax.jit(make_search_fn(k, d, False, layout="fused", lut_m=lut_m))

dt = timed(fn, eng.tables, _U32(index.bwtsize), q)
rec(exp="J-real250", variant="real-entries-real-lut",
    reads_per_s=round(B / dt))

# b. fake entries of identical shape/dtype, same process, same LUT
real_entries = eng.tables["entries"]
shape = real_entries.shape
fake = jax.device_put(
    jnp.asarray(rng.integers(0, 2**32, size=shape, dtype=np.uint32))
)
tab2 = dict(eng.tables)
tab2["entries"] = fake
dt = timed(fn, tab2, _U32(index.bwtsize), q)
rec(exp="J-real250", variant="fake-entries-real-lut",
    reads_per_s=round(B / dt))
del fake, tab2

# c. real entries, counters shuffled within each row (keeps distribution
# per row, destroys cross-row monotone structure is preserved; instead
# shuffle ROWS of the counter block to destroy block-monotone growth)
bmw = 2 * k * (d // 32)
host = np.asarray(jax.device_get(real_entries))
perm = rng.permutation(host.shape[0])
host[:, bmw:] = host[perm, bmw:]
tab3 = dict(eng.tables)
tab3["entries"] = jax.device_put(jnp.asarray(host))
del host
dt = timed(fn, tab3, _U32(index.bwtsize), q)
rec(exp="J-real250", variant="real-entries-shuffled-counters",
    reads_per_s=round(B / dt))

print("probe56 done", flush=True)

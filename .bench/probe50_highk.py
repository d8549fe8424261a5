"""Probe 50 (round 3): high-k x layout x d sweep at 1M-read waves.

VERDICT round 2 item 1: the flagship (k=3 d=128 fused lut12, 1.22M reads/s)
sits at ~90% of the proven XLA-gather-rate ceiling (~88M rows/s), so the
only lever left is GATHERS PER READ. k=4+lut12 fused needs 54 gather rows
per read (27 rounds x 2 ends) vs the flagship's 72; if the rate holds
that is ~1.6M reads/s. The k>=4 numbers in PERF.md predate the batch-size
correction and never tried the upgraded split layout (narrow bitmap rows +
flat counter gather — dodges the 4^k-counter row-width tax).

Matrix: k=3 flagship re-baseline; k=4 x d{96,128,160,192} x {fused,split}
x lut12; k=5 x d{128,160} x {fused,split} x lut10. 1M reads x 120 bp,
10 Mbase reference, iterations=3, host-fetch barrier timing.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from tpufm.bench import _enable_compile_cache

_enable_compile_cache()

import jax
import jax.numpy as jnp

from tpufm.config import IndexConfig
from tpufm.engine.oracle import search_oracle
from tpufm.engine.xla import XLAEngine
from tpufm.index.builder import build_index
from tpufm.io.genreads import generate_reads
from tpufm.utils.timer import timed_device_passes

REFSIZE = 10_000_000
NQ = 1 << 20
QLEN = 120
ITERS = 3

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=REFSIZE, dtype=np.uint8)
queries = generate_reads(codes, QLEN, NQ, seed=1)
vidx = np.sort(np.random.default_rng(2).choice(NQ, 4096, replace=False))

CONFIGS = [
    # (k, d, layout, lut_m)
    (3, 128, "fused", 12),            # flagship re-baseline
    (4, 96, "fused", 12), (4, 96, "split", 12),
    (4, 128, "fused", 12), (4, 128, "split", 12),
    (4, 160, "fused", 12), (4, 160, "split", 12),
    (4, 192, "fused", 12), (4, 192, "split", 12),
    (5, 128, "fused", 10), (5, 128, "split", 10),
    (5, 160, "fused", 10), (5, 160, "split", 10),
]

out_path = "/root/repo/.bench/probe50_highk.jsonl"
built = {}
for k, d, layout, lut_m in CONFIGS:
    if (k, d) not in built:
        t0 = time.perf_counter()
        built[(k, d)] = build_index(codes, IndexConfig(k=k, d=d))
        print(f"built k={k} d={d} in {time.perf_counter()-t0:.1f}s", flush=True)
    index = built[(k, d)]
    try:
        eng = XLAEngine(index, layout=layout, lut_m=lut_m)
        qd = jax.device_put(jnp.asarray(queries, jnp.uint8))
        dt, dt_min = timed_device_passes(
            lambda: eng.search_device(qd), iterations=ITERS
        )
        out = np.asarray(jax.device_get(eng.search_device(qd)))
        exact = bool((out[vidx] == search_oracle(index, queries[vidx])).all())
        rounds = (QLEN - lut_m) // k
        rec = {
            "k": k, "d": d, "layout": layout, "lut_m": lut_m,
            "rounds": rounds, "gather_rows_per_read": 2 * rounds * (2 if layout == "split" else 1),
            "seconds_per_pass": dt, "min_seconds": dt_min,
            "reads_per_s": round(NQ / dt),
            "row_words": int(2 * k * (d // 32) + (4 ** k if layout == "fused" else 0)),
            "bit_exact": exact,
        }
    except Exception as e:  # noqa: BLE001 — record and continue the matrix
        rec = {"k": k, "d": d, "layout": layout, "lut_m": lut_m,
               "error": repr(e)[:300]}
    print(json.dumps(rec), flush=True)
    with open(out_path, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
print("probe50 done", flush=True)

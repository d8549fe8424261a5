"""Probe 71: HBM-regime re-measure with the INTEGRATED tree counter pick.

The round-3 artifacts idx250m/idx3g were lost with the previous host, so
this rebuilds a 250 Mbase random reference (throughput-equivalent: gather
addresses are data-dependent uniform either way) and measures:

  1. 250M k=3 d=192 lut12 — the genome-scale HBM-regime flagship config
     (recommend_config's large-reference pick) at 1M-read waves.
  2. 120M k=3 d=320 lut12 — does the d ladder's VMEM-residency fast
     regime extend past the measured ~63M point (probe64: 2.05M)?

Bit-exactness: a 64K uniform sample per config vs the oracle engine.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
from tpufm.bench import _enable_compile_cache

_enable_compile_cache()

import numpy as np

OUT = "/root/repo/.bench/probe71_session.jsonl"


def log(o):
    print(json.dumps(o), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(o) + "\n")


def run_config(codes, sa, k, d, tag):
    from tpufm.config import IndexConfig
    from tpufm.engine.oracle import OracleEngine
    from tpufm.engine.xla import XLAEngine
    from tpufm.index.builder import build_index

    t0 = time.perf_counter()
    index = build_index(codes, IndexConfig(k=k, d=d), sa=sa)
    log({"exp": f"{tag}_build", "secs": round(time.perf_counter() - t0, 1)})
    eng = XLAEngine(index, lut_m=12)
    rng = np.random.default_rng(7)
    B, L = 1 << 20, 120
    starts = rng.integers(0, codes.shape[0] - L, size=B)
    q = np.stack([codes[s : s + L] for s in starts])
    out = eng.search(q)  # warm + for verification
    ts = []
    for _ in range(3):
        t1 = time.perf_counter()
        eng.search(q)
        ts.append(time.perf_counter() - t1)
    # uniform 64K-sample oracle verification
    oracle = OracleEngine(index)
    sel = rng.choice(B, size=1 << 16, replace=False)
    ref = oracle.search(q[sel])
    exact = bool(np.array_equal(np.asarray(out)[sel], np.asarray(ref)))
    log({"exp": tag, "k": k, "d": d, "lut_m": 12, "reads": B, "L": L,
         "reads_per_s": round(B / min(ts)), "exact": exact})
    del eng, index


def main():
    from tpufm.index.suffix_array import suffix_array

    rng = np.random.default_rng(0)

    codes = rng.integers(0, 4, size=250_000_000, dtype=np.uint8)
    t0 = time.perf_counter()
    sa = suffix_array(codes)
    log({"exp": "probe71_sa250m", "secs": round(time.perf_counter() - t0, 1)})
    run_config(codes, sa, 3, 192, "probe71_250M_d192")
    del sa, codes

    codes = rng.integers(0, 4, size=120_000_000, dtype=np.uint8)
    sa = suffix_array(codes)
    run_config(codes, sa, 3, 320, "probe71_120M_d320")
    run_config(codes, sa, 3, 192, "probe71_120M_d192")
    print("probe71 done", flush=True)


if __name__ == "__main__":
    main()

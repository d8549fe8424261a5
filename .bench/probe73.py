"""Probe 73: flagship d sweep at 10 Mbase with the integrated tree pick.

probe64 measured 63M d=320 at 2.05M reads/s — ABOVE the 10M d=128
flagship (1.86M). If larger d is faster inside the VMEM regime too
(fewer rows -> smaller table; rows still one-tile), the flagship config
and recommend_config's small-reference pick are wrong. Sweep
d in {128, 192, 256, 320, 448} at k=3 lut12, 1M reads x 120 bp, with a
64K uniform-sample oracle check per point.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
from tpufm.bench import _enable_compile_cache

_enable_compile_cache()

import numpy as np

OUT = "/root/repo/.bench/probe73_session.jsonl"


def log(o):
    print(json.dumps(o), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(o) + "\n")


def main():
    from tpufm.config import IndexConfig
    from tpufm.engine.oracle import search_oracle
    from tpufm.engine.xla import XLAEngine
    from tpufm.index.builder import build_index
    from tpufm.index.suffix_array import suffix_array

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=10_000_000, dtype=np.uint8)
    sa = suffix_array(codes)
    B, L = 1 << 20, 120
    starts = rng.integers(0, codes.shape[0] - L, size=B)
    q = np.stack([codes[s : s + L] for s in starts])
    sel = rng.choice(B, size=1 << 16, replace=False)
    ref = None
    for d in (128, 192, 256, 320, 448):
        index = build_index(codes, IndexConfig(k=3, d=d), sa=sa)
        eng = XLAEngine(index, lut_m=12)
        out = np.asarray(eng.search(q))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            eng.search(q)
            ts.append(time.perf_counter() - t0)
        if ref is None:
            ref = np.asarray(search_oracle(index, q[sel]))
        exact = bool(np.array_equal(out[sel], ref))
        log({"exp": "probe73_dsweep_10M", "k": 3, "d": d, "lut_m": 12,
             "reads": B, "reads_per_s": round(B / min(ts)),
             "exact": exact})
        del eng, index
    print("probe73 done", flush=True)


if __name__ == "__main__":
    main()

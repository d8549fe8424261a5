"""Probe 67: round-3 feature costs on the real TPU (run after probe66).

  1. Any-length tail overhead: flagship config at L=150 (r=0) vs L=151
     (r=1 tail round) vs L=152 (r=2), same 1M-read waves — the tail is one
     extra scan round on a tiny table, expected ~1/50 of a pass.
  2. Hamming<=1 counting throughput: count(mismatches=1) at L=120
     (361 variants/read) — reads/s and effective variant-lanes/s vs the
     flagship exact rate.
  3. RC pass: 2B-batch both-strands throughput (expected = exact rate at
     2x reads).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
from tpufm.bench import _enable_compile_cache

_enable_compile_cache()

import numpy as np

OUT = "/root/repo/.bench/probe67_session.jsonl"


def log(o):
    print(json.dumps(o), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(o) + "\n")


def main():
    from tpufm.config import IndexConfig
    from tpufm.engine.xla import XLAEngine
    from tpufm.index.builder import build_index
    from tpufm.index.suffix_array import suffix_array
    from tpufm.utils.encoding import reverse_complement

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=10_000_000, dtype=np.uint8)
    sa = suffix_array(codes)
    index = build_index(codes, IndexConfig(k=3, d=128), sa=sa)
    tail = build_index(codes, IndexConfig(k=1, d=128), sa=sa)
    eng = XLAEngine(index, lut_m=12, tail_index=tail)

    # 1. tail overhead
    for L in (150, 151, 152):
        q = rng.integers(0, 4, size=(1 << 20, L), dtype=np.uint8)
        eng.search(q)  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            eng.search(q)
            ts.append(time.perf_counter() - t0)
        log({"exp": "probe67_tail", "L": L, "r": (L - 12) % 3,
             "reads_per_s": round((1 << 20) / min(ts))})

    # 2. mismatch counting (smaller read set: 361x lanes per read)
    qm = rng.integers(0, 4, size=(1 << 16, 120), dtype=np.uint8)
    eng.count(qm, mismatches=1)  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        cnt = eng.count(qm, mismatches=1)
        ts.append(time.perf_counter() - t0)
    dt = min(ts)
    log({"exp": "probe67_mm1", "reads": 1 << 16, "L": 120,
         "reads_per_s": round((1 << 16) / dt),
         "variant_lanes_per_s": round((1 << 16) * 361 / dt),
         "mean_count": float(cnt.mean())})

    # 3. both strands in one pass
    q = rng.integers(0, 4, size=(1 << 20, 120), dtype=np.uint8)
    both = np.concatenate([q, reverse_complement(q)])
    eng.search(both)  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        eng.search(both)
        ts.append(time.perf_counter() - t0)
    log({"exp": "probe67_rc", "reads_both_strands_per_s":
         round((1 << 20) / min(ts)),
         "strand_lanes_per_s": round((1 << 21) / min(ts))})
    print("probe67 done", flush=True)


if __name__ == "__main__":
    main()

"""Probe 68: seed-and-extend (m>=2) throughput on the real TPU.

Flagship-adjacent config (k=3, d=128, lut12, 10 Mbase, s=32 locate
tables), 64K x 120 bp reads with m planted substitutions each, seed_hits
32. Records reads/s for m=2 and m=3 plus a 256-read naive-scan
verification, and one exact fused search+locate rate on the same tables
for context.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
from tpufm.bench import _enable_compile_cache

_enable_compile_cache()

import numpy as np

OUT = "/root/repo/.bench/probe68_session.jsonl"


def log(o):
    print(json.dumps(o), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(o) + "\n")


def main():
    from tpufm.config import IndexConfig
    from tpufm.engine.seed import SeedExtendEngine
    from tpufm.engine.xla import SearchLocateEngine
    from tpufm.index.builder import build_index
    from tpufm.index.locate import build_locate
    from tpufm.index.suffix_array import suffix_array

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=10_000_000, dtype=np.uint8)
    sa = suffix_array(codes)
    index = build_index(codes, IndexConfig(k=3, d=128), sa=sa)
    loc = build_locate(codes, sample_rate=32, d=128, sa=sa)

    B, L = 1 << 16, 120
    starts = rng.integers(0, codes.shape[0] - L, size=B)
    base_reads = np.stack([codes[s : s + L] for s in starts])
    wins = None

    # exact fused search+locate for context
    sl = SearchLocateEngine(index, loc, max_hits=4, lut_m=12)
    sl.search_locate(base_reads)  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sl.search_locate(base_reads)
        ts.append(time.perf_counter() - t0)
    log({"exp": "probe68_exact_fused", "reads": B, "L": L,
         "reads_per_s": round(B / min(ts))})

    for m in (2, 3):
        reads = base_reads.copy()
        for i in range(B):
            for p in rng.choice(L, size=m, replace=False):
                reads[i, p] = (reads[i, p] + rng.integers(1, 4)) & 3
        # A/B: compacted sampled-SA walk (default) vs full-width control
        for budget, tag in ((None, "compact"), (10**9, "full")):
            eng = SeedExtendEngine(
                index, loc, codes, mismatches=m, seed_hits=32, max_hits=4,
                lut_m=12, walk_budget=budget,
            )
            pos, cnt, ovf = eng.locate_approx(reads)  # warm
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                pos, cnt, ovf = eng.locate_approx(reads)
                ts.append(time.perf_counter() - t0)
            log({"exp": "probe68_seed_walk", "m": m, "walk": tag,
                 "reads": B, "reads_per_s": round(B / min(ts))})
        dt = min(ts)
        if wins is None:
            wins = np.lib.stride_tricks.sliding_window_view(codes, L)
        vidx = np.random.default_rng(1).choice(B, 256, replace=False)
        exact = True
        for i in vidx:
            want = np.flatnonzero(
                (wins != reads[i][None]).sum(axis=1) <= m
            ).astype(np.uint32)
            got = pos[i][pos[i] != 0xFFFFFFFF]
            if ovf[i]:
                exact &= bool(np.isin(got, want).all())
            else:
                exact &= int(cnt[i]) == want.size
                exact &= bool((got == want[: got.size]).all())
        log({"exp": "probe68_seed_verify", "m": m, "reads": B, "L": L,
             "full_walk_reads_per_s": round(B / dt),
             "recovered": int((cnt > 0).sum()),
             "overflow_reads": int(ovf.sum()),
             "bit_exact_sample": exact})
    print("probe68 done", flush=True)


if __name__ == "__main__":
    main()

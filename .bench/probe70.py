"""Probe 70: paired-end placement throughput on the real TPU.

Flagship-adjacent tables (k=3, d=128, lut12, 10 Mbase, s=32),
256K generated FR pairs of 120 bp, insert [250, 450]. The engine cost is
one fused search+locate pass over 4B reads plus the tiny pairing join, so
the expected rate is ~ (fused search+locate reads/s) / 4 pairs/s; the
probe records both to confirm the join is free.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
from tpufm.bench import _enable_compile_cache

_enable_compile_cache()

import numpy as np

OUT = "/root/repo/.bench/probe70_session.jsonl"


def log(o):
    print(json.dumps(o), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(o) + "\n")


def main():
    from tpufm.config import IndexConfig
    from tpufm.engine.paired import PairedEndEngine
    from tpufm.engine.xla import SearchLocateEngine
    from tpufm.index.builder import build_index
    from tpufm.index.locate import build_locate
    from tpufm.index.suffix_array import suffix_array
    from tpufm.io.genreads import generate_read_pairs

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=10_000_000, dtype=np.uint8)
    sa = suffix_array(codes)
    index = build_index(codes, IndexConfig(k=3, d=128), sa=sa)
    loc = build_locate(codes, sample_rate=32, d=128, sa=sa)

    B, L = 1 << 18, 120
    r1, r2, (ls, rs, minus) = generate_read_pairs(
        codes, L, B, 250, 450, seed=1, return_truth=True
    )

    sl = SearchLocateEngine(index, loc, max_hits=4, lut_m=12)
    q4 = np.concatenate([r1, r2, r1, r2])
    sl.search_locate(q4)  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sl.search_locate(q4)
        ts.append(time.perf_counter() - t0)
    log({"exp": "probe70_fused_4B", "reads": 4 * B,
         "reads_per_s": round(4 * B / min(ts))})

    eng = PairedEndEngine(index, loc, 250, 450, max_hits=4, max_pairs=4,
                          lut_m=12)
    out = eng.pair(r1, r2)  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = eng.pair(r1, r2)
        ts.append(time.perf_counter() - t0)
    pairs, strand, counts, overflow = out
    ok = 0
    for i in range(B):
        sym = 1 if minus[i] else 0
        hit = any(
            pairs[i, j, 0] == ls[i] and pairs[i, j, 1] == rs[i]
            and strand[i, j] == sym
            for j in range(4)
        )
        ok += hit
    log({"exp": "probe70_paired", "pairs": B, "L": L,
         "pairs_per_s": round(B / min(ts)),
         "planted_recovered": ok, "properly_paired": int((counts > 0).sum()),
         "overflow_pairs": int(overflow.sum())})
    print("probe70 done", flush=True)


if __name__ == "__main__":
    main()

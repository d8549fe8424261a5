"""Probe 69: edit-distance (Myers) alignment throughput on the real TPU.

Flagship-adjacent tables (k=3, d=128, lut12, 10 Mbase, s=32), 16K x
120 bp reads with E planted mixed edits, seed_hits 32. Records reads/s at
E in {1, 2} plus a small DP-oracle verification, and one wave-size
sensitivity point (WAVE 1<<13 vs 1<<14).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
from tpufm.bench import _enable_compile_cache

_enable_compile_cache()

import numpy as np

OUT = "/root/repo/.bench/probe69_session.jsonl"


def log(o):
    print(json.dumps(o), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(o) + "\n")


def main():
    from tpufm.config import IndexConfig
    from tpufm.engine.edit import EditExtendEngine, edit_extend_oracle
    from tpufm.index.builder import build_index
    from tpufm.index.locate import build_locate
    from tpufm.index.suffix_array import suffix_array

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=10_000_000, dtype=np.uint8)
    sa = suffix_array(codes)
    index = build_index(codes, IndexConfig(k=3, d=128), sa=sa)
    loc = build_locate(codes, sample_rate=32, d=128, sa=sa)

    B, L = 1 << 14, 120
    for E in (1, 2):
        origins = rng.integers(0, codes.shape[0] - L - E, size=B)
        reads = np.empty((B, L), np.uint8)
        for i, s0 in enumerate(origins):
            w = list(codes[s0 : s0 + L + E])
            for _ in range(E):
                op = rng.integers(0, 3)
                p = int(rng.integers(0, len(w) - 1))
                if op == 0:
                    w[p] = (w[p] + int(rng.integers(1, 4))) & 3
                elif op == 1:
                    del w[p]
                else:
                    w.insert(p, int(rng.integers(0, 4)))
            reads[i] = w[:L]
        for chars in ("inline", "pre"):
            eng = EditExtendEngine(
                index, loc, codes, edits=E, seed_hits=32, max_hits=4,
                lut_m=12, chars=chars,
            )
            out = eng.locate_edits(reads)  # warm (one jit per (E, chars))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = eng.locate_edits(reads)
                ts.append(time.perf_counter() - t0)
            log({"exp": "probe69_edit", "E": E, "chars": chars,
                 "wave": 1 << 13, "reads": B, "L": L,
                 "reads_per_s": round(B / min(ts))})
        pos, cnt, ovf = out
        vidx = np.random.default_rng(1).choice(B, 64, replace=False)
        want = edit_extend_oracle(codes, reads[vidx], E)
        sound = sensitive = True
        for row, i in enumerate(vidx):
            got = pos[i][pos[i] != 0xFFFFFFFF].astype(np.int64)
            for s in got:
                sound &= bool(want[row, s] <= E)
            if not ovf[i]:
                sensitive &= got.size > 0 and int(
                    np.abs(got - origins[i]).min()
                ) <= 2 * E
        log({"exp": "probe69_verify", "E": E, "sound": sound,
             "sensitive": sensitive, "recovered": int((cnt > 0).sum()),
             "overflow": int(ovf.sum())})
    print("probe69 done", flush=True)


if __name__ == "__main__":
    main()

"""Probe 65: round-3 feature measurements on the real TPU (post-hier).

Serial steps (run after probe64):
  1. Fused search+locate vs two-pass at 10 Mbase, 1M reads, max_hits 4.
  2. Regime re-check with the hier pick: 30M (d=128 HBM vs d=320 VMEM)
     and 60M d=320 — does the d ladder still hold and at what rates?
  3. locate_rows throughput (unchanged path — control).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
from tpufm.bench import _enable_compile_cache

_enable_compile_cache()

import numpy as np

OUT = "/root/repo/.bench/probe65_session.jsonl"


def log(o):
    print(json.dumps(o), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(o) + "\n")


def fused_locate_bench():
    import jax
    import jax.numpy as jnp

    from tpufm.config import IndexConfig
    from tpufm.engine.xla import LocateEngine, SearchLocateEngine, XLAEngine
    from tpufm.index.builder import build_index
    from tpufm.index.locate import build_locate
    from tpufm.index.suffix_array import suffix_array
    from tpufm.io.genreads import generate_reads

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=10_000_000, dtype=np.uint8)
    sa = suffix_array(codes)
    index = build_index(codes, IndexConfig(k=3, d=128), sa=sa)
    loc = build_locate(codes, sample_rate=32, d=128, sa=sa)
    reads = generate_reads(codes, 120, 1 << 20, seed=1)

    fused = SearchLocateEngine(index, loc, max_hits=4, lut_m=12)
    # warm
    iv_f, pos_f = fused.search_locate(reads)
    t0 = time.perf_counter()
    iv_f, pos_f = fused.search_locate(reads)
    t_f = time.perf_counter() - t0

    eng = XLAEngine(index, lut_m=12)
    lce = LocateEngine(loc)
    iv = eng.search(reads)
    pos = lce.locate_hits(iv, max_hits=4)
    t0 = time.perf_counter()
    iv = eng.search(reads)
    pos = lce.locate_hits(iv, max_hits=4)
    t_2 = time.perf_counter() - t0

    exact = bool((iv_f == np.asarray(iv)).all() and (pos_f == pos).all())
    log({
        "exp": "fused_locate_65", "reads": 1 << 20, "max_hits": 4,
        "fused_s": round(t_f, 3), "two_pass_s": round(t_2, 3),
        "fused_reads_per_s": int((1 << 20) / t_f),
        "two_pass_reads_per_s": int((1 << 20) / t_2),
        "exact": exact,
    })


def regime_recheck():
    from tpufm.bench import run_bench

    for refsize, d in [(30_000_000, 128), (30_000_000, 320), (60_000_000, 320)]:
        rec = run_bench(refsize=refsize, k=3, d=d, num_queries=1 << 20,
                        query_len=120, iterations=3, engine="xla", lut_m=12,
                        compare_reference=False)
        log({"exp": "regime65", "refsize": refsize, "d": d,
             "reads_per_s": rec["detail"]["reads_per_s"],
             "exact": rec["detail"]["bit_exact_vs_oracle"]})


def wave_recheck():
    """The 1M-read wave optimum predates the hier pick — re-sweep."""
    import jax
    import jax.numpy as jnp

    from tpufm.config import IndexConfig
    from tpufm.engine.xla import XLAEngine
    from tpufm.index.builder import build_index
    from tpufm.io.genreads import generate_reads

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=10_000_000, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=3, d=128))
    eng = XLAEngine(index, lut_m=12)
    reads = generate_reads(codes, 120, 1 << 22, seed=1)
    for wave in (1 << 19, 1 << 20, 1 << 21, 1 << 22):
        eng.search(reads[:wave], wave=wave)  # warm this shape
        t0 = time.perf_counter()
        eng.search(reads, wave=wave)
        dt = time.perf_counter() - t0
        log({"exp": "wave65", "wave": wave,
             "reads_per_s": int((1 << 22) / dt)})


if __name__ == "__main__":
    which = sys.argv[1:] or ["fused", "regime", "wave"]
    if "fused" in which:
        fused_locate_bench()
    if "regime" in which:
        regime_recheck()
    if "wave" in which:
        wave_recheck()
    print("probe65 done", flush=True)

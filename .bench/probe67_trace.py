"""Probe 67 (round 3, post-hier): trace the integrated hier-pick flagship.

After the two-stage one-hot counter pick (probe63: 1.83M reads/s), the
remaining headroom question is where the residual ~90 ms (vs the 136 ms
pure-gather bound of a 573 ms pass) goes: the pick's predicated sums, the
match/popcount, or the boundary masks. Capture one fast-regime pass and
pull the per-fusion breakdown like probe52 did pre-hier (gather fusion.34
136 ms / pick fusion.38 420 ms — the .38 row should be gone now).
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

from tpufm.config import IndexConfig
from tpufm.engine.xla import XLAEngine
from tpufm.index.builder import build_index
from tpufm.io.genreads import generate_reads

B, L, k, d, lut_m = 1 << 20, 120, 3, 128, 12


def main():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=10_000_000, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=k, d=d))
    queries = generate_reads(codes, L, B, seed=1)
    eng = XLAEngine(index, lut_m=lut_m)
    qd = jax.device_put(jnp.asarray(queries, jnp.uint8))

    def sync(x):
        np.asarray(jax.device_get(x.ravel()[:8]))

    sync(eng.search_device(qd))  # warm/compile outside the trace
    tdir = "/root/repo/.bench/trace_r3/fast_10M_hier"
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir):
        t0 = time.perf_counter()
        out = eng.search_device(qd)
        sync(out)
        wall = time.perf_counter() - t0
    rows = 2 * ((L - lut_m) // k) * B
    row_bytes = eng.tables["entries"].shape[1] * 4
    rec = {
        "tag": "fast_10M_hier",
        "wall_seconds": wall,
        "reads_per_s": round(B / wall),
        "achieved_gather_GBps": round(rows * row_bytes / wall / 1e9, 1),
        "trace_dir": tdir,
    }
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    ops = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "?")
                ops[name] = ops.get(name, 0) + ev["dur"]
    rec["trace_top_ops_us"] = sorted(ops.items(), key=lambda kv: -kv[1])[:20]
    print(json.dumps(rec), flush=True)
    with open("/root/repo/.bench/probe67_trace.json", "w") as fh:
        json.dump(rec, fh, indent=1)
    print("probe67 done", flush=True)


if __name__ == "__main__":
    main()

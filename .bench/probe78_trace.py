"""Probe 78 (round 4): refreshed jax.profiler capture of the flagship
pass with the TREE counter pick (the round-3 trace in trace_r3/ predates
it: gather 136 ms + take-pick 420 ms of an 879 ms pass). One fast-regime
pass (10 Mbase) and one HBM-regime pass (80 Mbase, over the measured
~215K-entry VMEM boundary), device plane included, per-op durations
derived into probe78_trace.json. Reference anchor: likwid MEM region
"Search" (common/searchQueries.c:87-93)."""

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

B, L, k, d, lut_m = 1 << 20, 120, 3, 192, 12


def run_one(refsize, tag):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=refsize, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=k, d=d))
    queries = generate_reads(codes, L, B, seed=1)
    eng = XLAEngine(index, lut_m=lut_m)
    qd = jax.device_put(jnp.asarray(queries, jnp.uint8))

    def sync(x):
        np.asarray(jax.device_get(x.ravel()[:8]))

    sync(eng.search_device(qd))  # warm/compile outside the trace
    tdir = f"/root/repo/.bench/trace_r4/{tag}"
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir):
        t0 = time.perf_counter()
        out = eng.search_device(qd)
        sync(out)
        wall = time.perf_counter() - t0
    rows = 2 * ((L - lut_m) // k) * B
    row_bytes = eng.tables["entries"].shape[1] * 4
    rec = {
        "tag": tag,
        "refsize": refsize,
        "entries": int(eng.tables["entries"].shape[0]),
        "row_bytes": row_bytes,
        "wall_seconds": wall,
        "reads_per_s": round(B / wall),
        "gather_rows": rows,
        "achieved_gather_GBps": round(rows * row_bytes / wall / 1e9, 1),
        "trace_dir": tdir,
    }
    print(json.dumps(rec), flush=True)
    return rec


records = [run_one(10_000_000, "fast_10M_tree_d192"),
           run_one(80_000_000, "hbm_80M_tree_d192")]

for r in records:
    files = glob.glob(f"{r['trace_dir']}/**/*.trace.json.gz", recursive=True)
    ops = {}
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "?")
                ops[name] = ops.get(name, 0) + ev["dur"]
    top = sorted(ops.items(), key=lambda kv: -kv[1])[:15]
    r["trace_top_ops_us"] = top
    print(json.dumps({"tag": r["tag"], "top_ops_us": top}), flush=True)

with open("/root/repo/.bench/probe78_trace.json", "w") as fh:
    json.dump(records, fh, indent=1)
print("probe78 done", flush=True)

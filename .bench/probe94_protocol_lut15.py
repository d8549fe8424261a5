"""Probe 94: the full reference protocol (10.49M reads x 120 bp, 10 Mbase,
device-resident waves, 5 iterations) at lut12 vs lut15 — does the serving
opt-in move the HEADLINE number (round-4 record: 2.364M reads/s at lut12)?
Bracketed by 1M-wave controls."""
import json, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from tpufm.bench import _enable_compile_cache, _time_search
_enable_compile_cache()
from tpufm.config import IndexConfig
from tpufm.engine.xla import XLAEngine
from tpufm.index.builder import build_index
from tpufm.io.genreads import generate_reads
from tpufm.utils.timer import timed_device_passes

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, 10_000_000, dtype=np.uint8)
index = build_index(codes, IndexConfig(k=3, d=192))
N = 10_485_760
q = generate_reads(codes, 120, N, seed=1)
q1m = q[: 1 << 20]

def ctl():
    eng = XLAEngine(index, lut_m=12)
    qd = jax.device_put(np.asarray(q1m))
    dt, _ = timed_device_passes(lambda: eng.search_device(qd), iterations=3)
    return (1 << 20) / dt

def protocol(lut_m):
    eng = XLAEngine(index, lut_m=lut_m)
    dt, out = _time_search(eng, q, "xla", 5)
    return N / dt, out

c1 = ctl()
r12, out12 = protocol(12)
r15, out15 = protocol(15)
c2 = ctl()
exact = bool(np.array_equal(out12, out15))
rec = {"probe": 94, "ctl_before": round(c1), "protocol_lut12": round(r12),
       "protocol_lut15": round(r15), "delta_pct": round(100*(r15/r12-1), 2),
       "outputs_identical": exact, "ctl_after": round(c2), "reads": N}
print(json.dumps(rec), flush=True)
with open("/root/repo/.bench/probe94_protocol_lut15.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")

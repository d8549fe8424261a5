"""Probe 88: DataParallelEngine SPMD-wrapper overhead at mesh=1 on the real
chip — the mesh=1 control VERDICT r4 item 5a asked for (target <= 2%).
XLAEngine vs DataParallelEngine(make_mesh(1)), identical tables/queries,
device-resident timing, XLA control re-measured after (bracket)."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from tpufm.bench import _enable_compile_cache
_enable_compile_cache()
from tpufm.config import IndexConfig
from tpufm.engine.xla import XLAEngine
from tpufm.index.builder import build_index
from tpufm.io.genreads import generate_reads
from tpufm.parallel import make_mesh, DataParallelEngine
from tpufm.utils.timer import timed_device_passes

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, 10_000_000, dtype=np.uint8)
index = build_index(codes, IndexConfig(k=3, d=192))
q = generate_reads(codes, 120, 1 << 20, seed=1)

def rate_xla():
    eng = XLAEngine(index, lut_m=12)
    qd = jax.device_put(np.asarray(q))
    dt, _ = timed_device_passes(lambda: eng.search_device(qd), iterations=5)
    return (1 << 20) / dt

def rate_dp():
    eng = DataParallelEngine(index, make_mesh(1), lut_m=12)
    qd = eng.shard_queries(q)
    dt, _ = timed_device_passes(lambda: eng.search_device(qd), iterations=5)
    out = np.asarray(jax.device_get(eng.search_device(qd)))
    eng1 = XLAEngine(index, lut_m=12)
    ok = bool(np.array_equal(out, np.asarray(eng1.search(q[:len(out)]))))
    return (1 << 20) / dt, ok

ctl_before = rate_xla()
dp, exact = rate_dp()
ctl_after = rate_xla()
ctl = max(ctl_before, ctl_after)
rec = {"probe": 88, "ctl_before": round(ctl_before), "dp_mesh1": round(dp),
       "ctl_after": round(ctl_after), "overhead_pct": round(100*(1-dp/ctl), 2),
       "bit_exact": exact}
print(json.dumps(rec))
with open("/root/repo/.bench/probe88_mesh1.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")

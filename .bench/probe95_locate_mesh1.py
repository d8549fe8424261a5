"""Probe 95: DataParallelLocate SPMD overhead at mesh=1 on the real chip —
completes probe 88's control for the locate walk (the other device-resident
production path)."""
import json, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from tpufm.bench import _enable_compile_cache
_enable_compile_cache()
from tpufm.index.locate import build_locate, locate_oracle
from tpufm.engine.xla import LocateEngine
from tpufm.parallel import make_mesh, DataParallelLocate
from tpufm.utils.timer import timed_device_passes

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, 10_000_000, dtype=np.uint8)
loc = build_locate(codes, sample_rate=32, d=128)
rows = rng.integers(0, 10_000_001, size=1 << 20, dtype=np.uint32)

def rate_single():
    eng = LocateEngine(loc)
    rd = jax.device_put(rows)
    dt, _ = timed_device_passes(lambda: eng.locate_rows(rd, wave=1 << 20),
                                iterations=5)
    return (1 << 20) / dt

def rate_dp():
    eng = DataParallelLocate(loc, make_mesh(1))
    rd = eng.place_rows(rows)
    dt, _ = timed_device_passes(lambda: eng.locate_device(rd), iterations=5)
    out = np.asarray(jax.device_get(eng.locate_device(rd)))
    ok = bool(np.array_equal(out, locate_oracle(loc, rows)))
    return (1 << 20) / dt, ok

ctl1 = rate_single()
dp, exact = rate_dp()
ctl2 = rate_single()
rec = {"probe": 95, "ctl_before": round(ctl1), "dp_locate_mesh1": round(dp),
       "ctl_after": round(ctl2), "bit_exact": exact,
       "overhead_pct": round(100 * (1 - dp / max(ctl1, ctl2)), 2)}
print(json.dumps(rec))
with open("/root/repo/.bench/probe95_locate_mesh1.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")

"""Probe 93: (a) lut15 in the HBM regime — at 250 Mbase rounds drop 36->35
(+2.8% predicted under the gather-issue model); lut15 was only ever
measured in the VMEM regime (+2.4%, probe87c). (b) sharded-index engine at
mesh=1 — the routing-machinery floor on one chip (complement of probe 88's
DP control). Bracketed."""
import json, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from tpufm.bench import _enable_compile_cache
_enable_compile_cache()
from tpufm.config import IndexConfig
from tpufm.engine.xla import XLAEngine
from tpufm.index.store import load_store
from tpufm.index.builder import build_index
from tpufm.io.genreads import generate_reads
from tpufm.parallel import make_mesh, ShardedIndexEngine
from tpufm.utils.timer import timed_device_passes

recs = []

# --- (b) sharded mesh=1 control at the 10 Mbase flagship ---
rng = np.random.default_rng(0)
codes10 = rng.integers(0, 4, 10_000_000, dtype=np.uint8)
idx10 = build_index(codes10, IndexConfig(k=3, d=192))
q = generate_reads(codes10, 120, 1 << 20, seed=1)

def rate_xla(idx, lut_m, queries):
    eng = XLAEngine(idx, lut_m=lut_m)
    qd = jax.device_put(np.asarray(queries))
    dt, _ = timed_device_passes(lambda: eng.search_device(qd), iterations=5)
    return queries.shape[0] / dt, eng

ctl1, eng_std = rate_xla(idx10, 12, q)
sh = ShardedIndexEngine(idx10, make_mesh(1), routing="a2a", lut_m=12)
qd = sh.place_queries(q)
dt, _ = timed_device_passes(lambda: sh.search_device(qd), iterations=5)
sh_rate = (1 << 20) / dt
out = sh._run_wave(q)
exact = bool(np.array_equal(out, np.asarray(eng_std.search(q))))
ctl2, _ = rate_xla(idx10, 12, q)
recs.append({"probe": "93b", "ctl_before": round(ctl1), "sharded_mesh1_a2a": round(sh_rate),
             "ctl_after": round(ctl2), "bit_exact": exact,
             "overhead_pct": round(100 * (1 - sh_rate / max(ctl1, ctl2)), 2)})
print(json.dumps(recs[-1]), flush=True)

# --- (a) lut15 at 250 Mbase (HBM regime) ---
idx250 = load_store("/root/repo/.bench/genome/idx_250000000_k3_d192_s0.tpufm")
rng = np.random.default_rng(0)
codes250 = rng.integers(0, 4, 250_000_000, dtype=np.uint8)
q250 = generate_reads(codes250, 120, 1 << 20, seed=1)
r12, eng12 = rate_xla(idx250, 12, q250)
print(json.dumps({"probe": "93a", "stage": "lut12", "reads_per_s": round(r12)}), flush=True)
r15, eng15 = rate_xla(idx250, 15, q250)
exact15 = bool(np.array_equal(np.asarray(eng15.search(q250[:65536])),
                              np.asarray(eng12.search(q250[:65536]))))
ctl3, _ = rate_xla(idx10, 12, q)
recs.append({"probe": "93a", "hbm_lut12": round(r12), "hbm_lut15": round(r15),
             "delta_pct": round(100 * (r15 / r12 - 1), 2), "bit_exact": exact15,
             "ctl_after": round(ctl3)})
print(json.dumps(recs[-1]), flush=True)
with open("/root/repo/.bench/probe93_hbm_lut15.jsonl", "a") as f:
    for r in recs:
        f.write(json.dumps(r) + "\n")

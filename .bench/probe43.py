"""probe43: locate throughput after one-hot rewrite (10 Mbase, d=128, s=32)."""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from tpufm.index.locate import build_locate
from tpufm.index.suffix_array import suffix_array
from tpufm.engine.xla import LocateEngine
from tpufm.utils.timer import timed_device_passes

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=10_000_000, dtype=np.uint8)
sa = suffix_array(codes)
loc = build_locate(codes, sample_rate=32, d=128, sa=sa)
eng = LocateEngine(loc)
N = 1 << 20
rows = jnp.asarray(rng.integers(0, 10_000_001, N, dtype=np.uint32))
dt, _ = timed_device_passes(lambda: eng._locate(eng.tables, rows), iterations=3)
out = np.asarray(jax.device_get(eng._locate(eng.tables, rows)))
# verify a sample against the suffix array
ridx = np.asarray(rng.integers(0, N, 2000))
expect = sa[np.asarray(jax.device_get(rows))[ridx]].astype(np.uint32)
ok = bool((out[ridx] == expect).all())
print(f"locate 1M rows: {dt:.3f}s = {N/dt/1e3:.0f}K positions/s  exact={ok}", flush=True)

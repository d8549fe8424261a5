import sys, time
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from tpufm import build_index, build_locate, IndexConfig
from tpufm.engine.xla import XLAEngine, LocateEngine
from tpufm.index.suffix_array import suffix_array
from tpufm.io.genreads import generate_reads
from tpufm.utils.timer import timed_device_passes

rng = np.random.default_rng(0)
N = 10_000_000
codes = rng.integers(0, 4, size=N, dtype=np.uint8)
sa = suffix_array(codes)
for s in (32,):
    t0 = time.time()
    loc = build_locate(codes, sample_rate=s, d=128, sa=sa)
    eng = LocateEngine(loc)
    print(f"s={s}: build {time.time()-t0:.1f}s, samples={loc.samples.shape[0]:,} ({loc.samples.nbytes/1e6:.0f} MB)", flush=True)
    rows = jnp.asarray(rng.integers(0, N + 1, size=2**20, dtype=np.uint32))
    mean_s, min_s = timed_device_passes(lambda: eng._locate(eng.tables, rows), iterations=3)
    got = np.asarray(jax.device_get(eng._locate(eng.tables, rows)))[:512]
    ok = (got == sa[np.asarray(rows[:512])].astype(np.uint32)).all()
    print(f"  locate 1M rows: {min_s:.3f}s  rows/s={2**20/min_s:,.0f}  exact={ok}", flush=True)
    del eng, loc

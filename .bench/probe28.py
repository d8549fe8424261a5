import sys, time
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from tpufm import build_index, IndexConfig
from tpufm.engine.xla import XLAEngine
from tpufm.engine.oracle import search_oracle
from tpufm.io.genreads import generate_reads
from tpufm.utils.timer import timed_device_passes

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=10_000_000, dtype=np.uint8)
B = 2**20
q = generate_reads(codes, 120, B, seed=7)
qd = jax.device_put(jnp.asarray(q, jnp.uint8))

for k, d, lut in [(4, 256, 12), (4, 128, 12), (4, 256, 0), (3, 128, 12), (2, 64, 12)]:
    index = build_index(codes, IndexConfig(k=k, d=d))
    eng = XLAEngine(index, lut_m=lut)
    mean_s, min_s = timed_device_passes(lambda: eng.search_device(qd), iterations=3)
    got = np.asarray(jax.device_get(eng.search_device(qd)))[:64]
    ok = (got == search_oracle(index, q[:64])).all()
    print(f"k={k} d={d:3d} lut={lut:2d} @1M wave: {min_s:.3f}s  reads/s={B/min_s:10,.0f}  exact={ok}", flush=True)
    del eng, index

"""probe39: end-to-end XLAEngine gather="dma" vs gather="xla", real 10Mbase
index, flagship config (k=3 d=128 lut12), 512K reads x 120bp."""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp, time
from tpufm.config import IndexConfig
from tpufm.engine.xla import XLAEngine
from tpufm.engine.oracle import search_oracle
from tpufm.index.builder import build_index
from tpufm.io.genreads import generate_reads
from tpufm.utils.timer import timed_device_passes

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=10_000_000, dtype=np.uint8)
index = build_index(codes, IndexConfig(k=3, d=128))
B = 1 << 19
queries = generate_reads(codes, 120, B, seed=1)
qd = jax.device_put(jnp.asarray(queries, jnp.uint8))
expect = search_oracle(index, queries[:512])

for gather in ("xla", "dma"):
    eng = XLAEngine(index, lut_m=12, gather=gather)
    dt, _ = timed_device_passes(lambda: eng.search_device(qd), iterations=3)
    out = np.asarray(jax.device_get(eng.search_device(qd)))
    ok = bool((out[:512] == expect).all())
    print(f"gather={gather}: {B/dt/1e3:8.1f}K reads/s  ({dt*1e3:.0f} ms/pass)  bit_exact={ok}", flush=True)

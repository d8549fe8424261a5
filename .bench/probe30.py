import sys, time
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from tpufm import build_index, IndexConfig
from tpufm.index.formats import load_npz
from tpufm.engine.xla import XLAEngine
from tpufm.io.genreads import generate_reads
from tpufm.utils.timer import timed_device_passes

rng = np.random.default_rng(0)
B = 2**20

def run(tag, index, codes):
    q = generate_reads(codes, 120, B, seed=7)
    qd = jax.device_put(jnp.asarray(q, jnp.uint8))
    eng = XLAEngine(index, lut_m=12)
    mean_s, min_s = timed_device_passes(lambda: eng.search_device(qd), iterations=3)
    E = index.nentries
    print(f"{tag} (E={E:9,d}): {min_s:.3f}s  reads/s={B/min_s:10,.0f}", flush=True)
    del eng, qd

codes = rng.integers(0, 4, size=100_000_000, dtype=np.uint8)
run("100M d=192", build_index(codes, IndexConfig(k=3, d=192)), codes)
codes = rng.integers(0, 4, size=160_000_000, dtype=np.uint8)
run("160M d=192", build_index(codes, IndexConfig(k=3, d=192)), codes)
idx250 = load_npz("/root/repo/.bench/idx250m.npz")
c250 = None
q250 = np.load("/root/repo/.bench/q250m.npy")
qd = jax.device_put(jnp.asarray(q250, jnp.uint8))
eng = XLAEngine(idx250, lut_m=12)
mean_s, min_s = timed_device_passes(lambda: eng.search_device(qd), iterations=3)
print(f"250M d=192 (E={idx250.nentries:9,d}): {min_s:.3f}s  reads/s={q250.shape[0]/min_s:10,.0f}", flush=True)

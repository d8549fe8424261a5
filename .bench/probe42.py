"""probe42: device build at scale vs host build; device-built tables feed
the engine in place; bit-exact search check."""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, time, jax.numpy as jnp
from tpufm.config import IndexConfig
from tpufm.index.builder import build_index
from tpufm.index.builder_device import build_index_device
from tpufm.engine.xla import XLAEngine
from tpufm.engine.oracle import search_oracle
from tpufm.io.genreads import generate_reads

rng = np.random.default_rng(0)

n = 64_000_000
cfg = IndexConfig(k=3, d=128)
codes = rng.integers(0, 4, size=n, dtype=np.uint8)
t0 = time.perf_counter()
dev_idx = build_index_device(codes, cfg, return_host=False)
t_dev_cold = time.perf_counter() - t0
print(f"n={n}: device build (cold, incl. compile) {t_dev_cold:.1f}s", flush=True)

t0 = time.perf_counter()
dev_idx = build_index_device(codes, cfg, return_host=False)
t_dev = time.perf_counter() - t0
print(f"n={n}: device build (warm) {t_dev:.1f}s", flush=True)

t0 = time.perf_counter()
host_idx = build_index(codes, cfg)
t_host = time.perf_counter() - t0
print(f"n={n}: host build {t_host:.1f}s  -> device speedup {t_host/t_dev:.1f}x", flush=True)

# spot-verify equality on strided rows + search bit-exactness
occ_dev = np.asarray(jax.device_get(dev_idx.occ[::4096]))
assert (occ_dev == host_idx.occ[::4096]).all(), "occ mismatch"
queries = generate_reads(codes, 120, 4096, seed=3)
eng = XLAEngine(dev_idx, lut_m=12)
assert (eng.search(queries) == search_oracle(host_idx, queries)).all(), "search mismatch"
print("64M: strided occ identical; device-built engine search bit-exact", flush=True)

n = 250_000_000
codes = rng.integers(0, 4, size=n, dtype=np.uint8)
cfg = IndexConfig(k=3, d=192)
t0 = time.perf_counter()
dev_idx = build_index_device(codes, cfg, return_host=False)
t_dev = time.perf_counter() - t0
print(f"n={n}: device build (k=3 d=192) {t_dev:.1f}s  (host SA-IS build known 322s)", flush=True)
queries = generate_reads(codes, 120, 4096, seed=3)
eng = XLAEngine(dev_idx, lut_m=12)
res = eng.search(queries)
host_small = None
# verify against oracle on a host-built index of the same text
t0 = time.perf_counter()
host_idx = build_index(codes, cfg)
t_host = time.perf_counter() - t0
print(f"n={n}: host build {t_host:.1f}s -> device speedup {t_host/t_dev:.1f}x", flush=True)
assert (res == search_oracle(host_idx, queries)).all(), "250M search mismatch"
occ_dev = np.asarray(jax.device_get(dev_idx.occ[::16384]))
assert (occ_dev == host_idx.occ[::16384]).all(), "250M occ mismatch"
print("250M: strided occ identical; search bit-exact. DONE", flush=True)

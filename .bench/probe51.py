"""probe51: (a) device SA worst case — repetitive text at 64M (full doubling
rounds); (b) locate throughput on a real 250 Mbase reference with
device-built tables."""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, time, jax.numpy as jnp
from tpufm.index.sa_device import suffix_array_device_arr

def sync(x): np.asarray(jax.device_get(x.ravel()[:1]))

# (a) worst case: period-3 repetitive 64M text
n = 64_000_000
codes = np.tile(np.array([0, 1, 2], np.uint8), n // 3 + 1)[:n].copy()
cd = jax.device_put(jnp.asarray(codes))
t0 = time.perf_counter()
order = suffix_array_device_arr(cd); sync(order)
t = time.perf_counter() - t0
print(f"repetitive 64M device SA: {t:.1f}s (random-text was ~3s of device work)", flush=True)
# sortedness spot check
sa = np.asarray(jax.device_get(order), np.int64)
tb = codes.tobytes()
idx = np.random.default_rng(0).integers(1, n, 300)
ok = all(tb[sa[i-1]:sa[i-1]+96] <= tb[sa[i]:sa[i]+96] for i in idx)
print(f"repetitive SA sorted: {ok}", flush=True)
del order, cd, sa

# (b) genome-path locate: 250M, device-built tables, 1M rows
from tpufm.index.builder_device import build_locate_device
from tpufm.engine.xla import LocateEngine
from tpufm.utils.timer import timed_device_passes
rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=250_000_000, dtype=np.uint8)
t0 = time.perf_counter()
loc = build_locate_device(codes, sample_rate=32, d=128, return_host=False)
print(f"250M locate tables built on device: {time.perf_counter()-t0:.1f}s", flush=True)
eng = LocateEngine(loc)
N = 1 << 20
rows = jnp.asarray(rng.integers(0, 250_000_001, N, dtype=np.uint32))
dt, _ = timed_device_passes(lambda: eng._locate(eng.tables, rows), iterations=3)
print(f"250M locate: {N/dt/1e3:.0f}K positions/s", flush=True)

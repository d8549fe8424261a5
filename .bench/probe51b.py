"""probe51b (fixes probe51 review findings): (a) repetitive-text device SA
compared ELEMENTWISE vs host SA-IS (the 96-byte sortedness check was
vacuous on periodic text); (b) device locate-table build timed WITH a
host-fetch barrier."""
import sys, time; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, jax.numpy as jnp
from tpufm.index.sa_device import suffix_array_device_arr
from tpufm.index.suffix_array import suffix_array_native

def sync(*xs):
    for x in xs: np.asarray(jax.device_get(x.ravel()[:1]))

n = 64_000_000
codes = np.tile(np.array([0, 1, 2], np.uint8), n // 3 + 1)[:n].copy()
cd = jax.device_put(jnp.asarray(codes))
t0 = time.perf_counter()
order = suffix_array_device_arr(cd); sync(order)
t_dev = time.perf_counter() - t0
t0 = time.perf_counter()
sa_host = suffix_array_native(codes)
t_host = time.perf_counter() - t0
sa_dev = np.asarray(jax.device_get(order), np.int64)
same = bool((sa_dev == sa_host).all())
print(f"repetitive 64M: device {t_dev:.1f}s, host SA-IS {t_host:.1f}s, identical={same}", flush=True)
del order, sa_dev, sa_host, cd

from tpufm.index.builder_device import build_locate_device
rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=250_000_000, dtype=np.uint8)
t0 = time.perf_counter()
loc = build_locate_device(codes, sample_rate=32, d=128, return_host=False)
sync(loc.mark_rank, loc.samples, loc.lf1.occ)  # true completion barrier
print(f"250M locate tables on device (with barrier): {time.perf_counter()-t0:.1f}s", flush=True)

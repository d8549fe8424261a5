"""probe41: device SA (prefix doubling on TPU) vs host SA-IS, 64M/250M bases."""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, time
from tpufm.index.suffix_array import suffix_array_native
from tpufm.index.sa_device import suffix_array_device

rng = np.random.default_rng(0)
for n in (64_000_000, 250_000_000):
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    t0 = time.perf_counter(); sa_d = suffix_array_device(codes); t_dev = time.perf_counter() - t0
    print(f"n={n}: device SA {t_dev:.1f}s", flush=True)
    if n <= 64_000_000:
        t0 = time.perf_counter(); sa_h = suffix_array_native(codes); t_host = time.perf_counter() - t0
        same = bool((sa_d == sa_h).all())
        print(f"n={n}: host SA-IS {t_host:.1f}s  speedup {t_host/t_dev:.1f}x  identical={same}", flush=True)
    else:
        # spot-check sortedness instead of a 5-min host rebuild
        idx = rng.integers(1, n, size=500)
        for i in idx:
            a, b = sa_d[i-1], sa_d[i]
            assert codes.tobytes()[a:a+64] <= codes.tobytes()[b:b+64]
        print(f"n={n}: sortedness spot-check OK (host SA-IS known ~322s at 250M)", flush=True)

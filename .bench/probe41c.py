import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, time
from tpufm.index.sa_device import suffix_array_device

rng = np.random.default_rng(0)
n = 250_000_000
codes = rng.integers(0, 4, size=n, dtype=np.uint8)
t0 = time.perf_counter(); sa = suffix_array_device(codes); t1 = time.perf_counter() - t0
print(f"n={n}: device SA total {t1:.1f}s (incl. compile)", flush=True)
t0 = time.perf_counter(); sa2 = suffix_array_device(codes); t2 = time.perf_counter() - t0
print(f"n={n}: device SA warm  {t2:.1f}s  identical={bool((sa==sa2).all())}", flush=True)
tb = codes.tobytes()
idx = rng.integers(1, n, size=500)
ok = all(tb[sa[i-1]:sa[i-1]+64] <= tb[sa[i]:sa[i]+64] for i in idx)
print(f"sortedness spot-check: {ok}  (host SA-IS at 250M: 322s)", flush=True)

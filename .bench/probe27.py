import sys, time
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from tpufm.index.formats import load_npz
from tpufm.engine.xla import XLAEngine
from tpufm.utils.timer import timed_device_passes

idx3g = load_npz("/root/repo/.bench/idx3g.npz")
q = np.load("/root/repo/.bench/q3g.npy")
qd1m = jax.device_put(jnp.asarray(q, jnp.uint8))
qd512 = jax.device_put(jnp.asarray(q[:2**19], jnp.uint8))

eng0 = XLAEngine(idx3g)   # no LUT
for name, qq, n in [("3G nolut 1M wave ", qd1m, 2**20), ("3G nolut 512K    ", qd512, 2**19)]:
    mean_s, min_s = timed_device_passes(lambda: eng0.search_device(qq), iterations=3)
    print(f"{name}: {min_s:.3f}s  reads/s={n/min_s:,.0f}", flush=True)
del eng0

eng = XLAEngine(idx3g, lut_m=12)
mean_s, min_s = timed_device_passes(lambda: eng.search_device(qd512), iterations=3)
print(f"3G lut12 512K    : {min_s:.3f}s  reads/s={2**19/min_s:,.0f}", flush=True)
del eng, idx3g, qd1m, qd512

idx250 = load_npz("/root/repo/.bench/idx250m.npz")
q250 = np.load("/root/repo/.bench/q250m.npy")
qd = jax.device_put(jnp.asarray(q250, jnp.uint8))
eng = XLAEngine(idx250, lut_m=12)
mean_s, min_s = timed_device_passes(lambda: eng.search_device(qd), iterations=3)
print(f"250M lut12 1M    : {min_s:.3f}s  reads/s={q250.shape[0]/min_s:,.0f}", flush=True)

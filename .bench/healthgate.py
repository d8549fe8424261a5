"""Device health gate: measure the fake-table flagship rate (k=3 d=128
lut12, E=78127, 1M reads) and exit 0 iff the device is in its known-good
state (>1.2M reads/s; the integrated tree-pick engine measures ~1.9-2.1M
when healthy, ~100-300K under the degraded tunnel state seen 2026-08-19
mid-morning). Compile-cached, so a warm check costs ~2 min."""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpufm.engine.xla import make_search_fn

_U32 = jnp.uint32
rng = np.random.default_rng(0)
B, L, E, k, d, lut_m = 1 << 20, 120, 78_127, 3, 128, 12


def main():
    nb = d // 32
    W = 2 * k * nb + 4**k
    span = E * d - 8
    ent = rng.integers(0, 2**32, size=(E + 1, W), dtype=np.uint32)
    ent[:, 2 * k * nb :] = rng.integers(0, span, size=(E + 1, 4**k),
                                        dtype=np.uint32)
    tables = {
        "entries": jax.device_put(jnp.asarray(ent)),
        "dollar_pos": jnp.zeros(k, _U32),
        "dollar_base": jnp.full(k, 3, _U32),
        "dollar_block": jnp.zeros(k, _U32),
        "lut": jax.device_put(jnp.asarray(
            rng.integers(0, span, size=(4**lut_m, 2), dtype=np.uint32))),
    }
    fn = jax.jit(make_search_fn(k, d, False, layout="fused", lut_m=lut_m))
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    out = fn(tables, _U32(span), q)
    np.asarray(jax.device_get(out.ravel()[:8]))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(tables, _U32(span), q)
        np.asarray(jax.device_get(out.ravel()[:8]))
        ts.append(time.perf_counter() - t0)
    rate = B / min(ts)
    rec = {"exp": "healthgate", "ts": time.time(),
           "reads_per_s": round(rate), "healthy": rate > 1_200_000}
    print(json.dumps(rec), flush=True)
    with open("/root/repo/.bench/healthgate.jsonl", "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    sys.exit(0 if rate > 1_200_000 else 1)


if __name__ == "__main__":
    main()

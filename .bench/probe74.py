"""Probe 74: does the accepted VMEM-budget knob move the MSA residency
boundary?

probe72 found jit(compiler_options=...) ACCEPTS xla_tpu_scoped_vmem_limit_kib
and xla_vf_max_vmem_used_by_memory_space_assignment on this remote-compile
tunnel. The physical ceiling is v5e VMEM = 128 MiB; at d=320 (124-word rows,
one 512 B lane-tile each) the table is E/2 KiB, so the best possible
boundary is ~250K entries (~80 Mbase) vs the measured default ~210K
(~63 Mbase at d=320 was FAST in probe64; the probe51 boundary was ~210K).

Sweep E x {control, vf_max=117M, scoped=16M (frees VMEM for MSA?),
scoped=96M (more scratch)} at d=320 k=3 lut12, 1M-read waves, fake tables
(rate follows table size, probe51). Plus one HBM-regime cell (E=781K,
250 Mbase): does more scoped VMEM speed the HBM gather itself?
"""

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
B, L = 1 << 20, 120
OUT = "/root/repo/.bench/probe74_session.jsonl"


def log(o):
    print(json.dumps(o), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(o) + "\n")


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:8]))


def timed(f, *a, it=3):
    out = f(*a)
    sync(out)
    ts = []
    for _ in range(it):
        t0 = time.perf_counter()
        out = f(*a)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def mk_tables(E, k, d, lut_m=0):
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
    }
    if lut_m:
        lut = rng.integers(0, span, size=(4**lut_m, 2), dtype=np.uint32)
        tables["lut"] = jax.device_put(jnp.asarray(lut))
    return tables


VARIANTS = [
    ("control", None),
    ("vf_max_117M", {"xla_vf_max_vmem_used_by_memory_space_assignment":
                     str(117 * 1024 * 1024)}),
    ("scoped_16M", {"xla_tpu_scoped_vmem_limit_kib": str(16 * 1024)}),
    ("vf117_scoped16", {
        "xla_vf_max_vmem_used_by_memory_space_assignment":
            str(117 * 1024 * 1024),
        "xla_tpu_scoped_vmem_limit_kib": str(16 * 1024),
    }),
]


def main():
    k, d, lut_m = 3, 320, 12
    q = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    # boundary band (units: entries; Mbase = E*320/1e6), then HBM control
    for E in (197_000, 215_000, 230_000, 245_000, 260_000, 781_250):
        tables = mk_tables(E, k, d, lut_m=lut_m)
        for name, opts in VARIANTS:
            if E == 781_250 and name == "vf117_scoped16":
                continue
            try:
                fn = jax.jit(
                    make_search_fn(k, d, False, layout="fused", lut_m=lut_m),
                    compiler_options=opts,
                )
                dt = timed(fn, tables, _U32(E * d - 8), q)
                log({"exp": "probe74", "E": E, "mbase": round(E * d / 1e6),
                     "variant": name, "reads_per_s": round(B / dt)})
            except Exception as e:
                log({"exp": "probe74", "E": E, "variant": name,
                     "err": str(e)[:300]})
        del tables
    print("probe74 done", flush=True)


if __name__ == "__main__":
    main()

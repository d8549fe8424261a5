"""Probe 72: can jit compiler_options reach the MSA VMEM budget?

docs/PERF.md's top open lead assumes the memory-space-assignment budget
is only reachable via LIBTPU_INIT_ARGS (impossible through this
remote-compile tunnel). But jax.jit(compiler_options=...) forwards
xla_* debug-option overrides to the TPU compiler — if any of the
candidate flags is accepted AND extends whole-table VMEM residency, the
~1.8-2M reads/s fast regime could stretch from ~63 Mbase toward ~120.

Steps:
  1. Flag acceptance on a trivial jit (cheap; rejected flags raise).
  2. For each accepted flag: 120M k=3 d=320 lut12 search jitted WITH the
     override at a large budget vs the probe71 control (same config, no
     override). A fast-regime rate (~2M) instead of the HBM rate (~0.9M)
     means the budget knob works from user code.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
from tpufm.bench import _enable_compile_cache

_enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

OUT = "/root/repo/.bench/probe72_session.jsonl"

CANDIDATES = [
    ("xla_tpu_scoped_vmem_limit_kib", str(96 * 1024)),
    ("xla_vf_max_vmem_used_by_memory_space_assignment",
     str(100 * 1024 * 1024)),
    ("xla_tpu_memory_space_assignment_max_vmem_bytes",
     str(100 * 1024 * 1024)),
]


def log(o):
    print(json.dumps(o), flush=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(o) + "\n")


def main():
    import jax.numpy as jnp

    accepted = []
    for name, val in CANDIDATES:
        try:
            f = jax.jit(lambda x: x * 2, compiler_options={name: val})
            f(jnp.ones((8, 128))).block_until_ready()
            accepted.append((name, val))
            log({"exp": "probe72_flag", "flag": name, "accepted": True})
        except Exception as e:
            log({"exp": "probe72_flag", "flag": name, "accepted": False,
                 "err": str(e)[:200]})
    if not accepted:
        log({"exp": "probe72", "verdict": "no flag reachable"})
        return

    from tpufm.config import IndexConfig
    from tpufm.engine.xla import XLAEngine, make_search_fn
    from tpufm.index.builder import build_index
    from tpufm.index.suffix_array import suffix_array

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=120_000_000, dtype=np.uint8)
    sa = suffix_array(codes)
    index = build_index(codes, IndexConfig(k=3, d=320), sa=sa)
    eng = XLAEngine(index, lut_m=12)
    B, L = 1 << 20, 120
    q = rng.integers(0, 4, size=(B, L), dtype=np.uint8)

    def timed(search):
        out = search(q)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            search(q)
            ts.append(time.perf_counter() - t0)
        return round(B / min(ts)), np.asarray(out)

    rate0, out0 = timed(eng.search)
    log({"exp": "probe72_control_120M_d320", "reads_per_s": rate0})

    bws = jnp.uint32(eng.bwtsize)
    for name, val in accepted:
        jitted = jax.jit(
            make_search_fn(eng.config.k, eng.config.d, False,
                           layout=eng.layout, lut_m=12),
            compiler_options={name: val},
        )

        def search(qq):
            r = jitted(eng.tables, bws, jnp.asarray(qq))
            return np.asarray(jax.block_until_ready(r))

        try:
            rate, out = timed(search)
            exact = bool(np.array_equal(out, out0))
            log({"exp": "probe72_override", "flag": name, "value": val,
                 "reads_per_s": rate, "exact_vs_control": exact})
        except Exception as e:
            log({"exp": "probe72_override", "flag": name,
                 "err": str(e)[:300]})
    print("probe72 done", flush=True)


if __name__ == "__main__":
    main()

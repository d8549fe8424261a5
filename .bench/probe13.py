"""Probe 13: dump optimized HLO of the real engine round — what gathers
does XLA actually emit?"""
import os, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from tpufm import build_index, IndexConfig
from tpufm.engine.xla import XLAEngine

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=1_000_000, dtype=np.uint8)
index = build_index(codes, IndexConfig(k=3, d=64))
eng = XLAEngine(index, layout="fused")
q = jnp.asarray(rng.integers(0, 4, size=(1024, 120), dtype=np.uint8))

lowered = jax.jit(eng._search).lower(eng.tables, jnp.uint32(index.bwtsize), q)
compiled = lowered.compile()
txt = compiled.as_text()
import re
for line in txt.splitlines():
    if re.search(r"gather|dynamic-slice|while", line) and "metadata" in line:
        line = line.split(" metadata")[0]
        print(line.strip()[:220])

"""Host-side build of a 250 Mbase index (k=3 d=192 — the genome-path config)
+ save to npz + generate 1M reads. CPU only; search timed separately."""
import os, time, sys
sys.path.insert(0, "/root/repo")
import numpy as np

from tpufm import build_index, IndexConfig
from tpufm.index.formats import save_npz
from tpufm.io.genreads import generate_reads

N = 3_000_000_000
rng = np.random.default_rng(0)
t0 = time.time()
codes = rng.integers(0, 4, size=N, dtype=np.uint8)
print(f"gen ref: {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
index = build_index(codes, IndexConfig(k=3, d=192))
print(f"build 3G k=3 d=192: {time.time()-t0:.0f}s  E={index.nentries}", flush=True)

t0 = time.time()
save_npz("/root/repo/.bench/idx3g.npz", index)
print(f"save npz: {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
q = generate_reads(codes, 120, 1_000_000, seed=7)
np.save("/root/repo/.bench/q3g.npy", q)
print(f"reads: {time.time()-t0:.0f}s", flush=True)

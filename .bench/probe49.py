"""probe49: the REAL >HBM design point — the 3 Gbase index (6.25 GB of
tables, loaded mmap from the .tpufm store) sharded 8 ways on the virtual
CPU mesh, searched with LUT + waves through all three routings, verified
against the reference-parity oracle results."""
import sys; sys.path.insert(0, "/root/repo")
import jax; jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_num_cpu_devices", 8)
import numpy as np, time, json
from tpufm.index.store import load_store
from tpufm.io.genreads import generate_reads
from tpufm.parallel import make_mesh, ShardedIndexEngine
from tpufm.engine.oracle import search_oracle

t0 = time.time()
idx = load_store("idx3g")
print(f"store open {time.time()-t0:.3f}s; entries={idx.nentries} "
      f"bytes={(idx.occ.nbytes+idx.bitmaps.nbytes)/2**30:.2f}GB", flush=True)

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, size=3_000_000_000, dtype=np.uint8)  # same seed as build
B = 1024
queries = generate_reads(codes, 120, B, seed=1)
del codes
t0 = time.time()
expect = search_oracle(idx, queries)
print(f"oracle {time.time()-t0:.1f}s", flush=True)

mesh = make_mesh(8)
rec = {"refsize": 3_000_000_000, "k": idx.config.k, "d": idx.config.d,
       "entries": idx.nentries, "devices": 8, "routings": {}}
for routing in ("allgather", "ring", "a2a"):
    t0 = time.time()
    eng = ShardedIndexEngine(idx, mesh, routing=routing, lut_m=6)
    t_up = time.time() - t0
    t0 = time.time()
    out = eng.search(queries, wave=512)
    dt = time.time() - t0
    ok = bool((out == expect).all())
    rec["routings"][routing] = {"setup_s": round(t_up,1), "search_s": round(dt,2), "bit_exact": ok}
    print(f"{routing}: setup {t_up:.1f}s search {dt:.2f}s exact={ok}", flush=True)
    del eng
print(json.dumps(rec))

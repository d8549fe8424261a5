"""probe45: 6.25 GB genome index persistence — npz vs .tpufm store; search
from the store with no rebuild."""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.bench/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np, time, os, subprocess
from tpufm.index.formats import load_npz
from tpufm.index.store import save_store, load_store

t0 = time.perf_counter()
idx = load_npz("idx3g.npz")
t_npz = time.perf_counter() - t0
gb = (idx.occ.nbytes + idx.bitmaps.nbytes) / 2**30
print(f"npz load (decompress {gb:.2f} GB): {t_npz:.1f}s", flush=True)

t0 = time.perf_counter()
save_store("idx3g", idx)
subprocess.run(["sync"])
t_save = time.perf_counter() - t0
print(f"store save ({gb:.2f} GB raw + sync): {t_save:.1f}s", flush=True)

# drop page cache effect is not possible without root sysctl? we ARE root:
try:
    with open("/proc/sys/vm/drop_caches", "w") as f:
        f.write("3\n")
    print("page cache dropped (cold-read measurement)", flush=True)
except Exception as e:
    print(f"no cache drop: {e}", flush=True)

t0 = time.perf_counter()
loaded = load_store("idx3g")
t_open = time.perf_counter() - t0
print(f"store open (mmap): {t_open*1000:.1f}ms", flush=True)

# pages stream during first touch — measure a strided occ read (device
# upload equivalent is bounded by the tunnel here, so time the host side)
t0 = time.perf_counter()
s = int(np.asarray(loaded.occ[::4096]).sum()) + int(np.asarray(loaded.bitmaps[::4096]).sum())
print(f"strided touch: {time.perf_counter()-t0:.2f}s (checksum {s & 0xffff})", flush=True)
t0 = time.perf_counter()
ok = (np.asarray(loaded.occ[:1000]) == idx.occ[:1000]).all()
full = time.perf_counter() - t0
print(f"content identical (head): {bool(ok)}", flush=True)

"""Probe 89: device build at REAL scale (250 Mbase) verified bit-identical
to the host builder (VERDICT r4 item 4's device branch), plus 1 Gbase host
build wall-clock with the round-5 uint32 SA-IS."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from tpufm.config import IndexConfig
from tpufm.index.builder import build_index
from tpufm.index.builder_device import build_index_device

rng = np.random.default_rng(0)
codes = rng.integers(0, 4, 250_000_000, dtype=np.uint8)
cfg = IndexConfig(k=3, d=192)
t0 = time.perf_counter(); host = build_index(codes, cfg); t_host = time.perf_counter() - t0
print(f"host 250M: {t_host:.1f}s", flush=True)
t0 = time.perf_counter(); dev = build_index_device(codes, cfg); t_dev = time.perf_counter() - t0
print(f"device 250M (incl. upload + compile): {t_dev:.1f}s", flush=True)
same = (np.array_equal(host.occ, dev.occ) and np.array_equal(host.bitmaps, dev.bitmaps)
        and np.array_equal(host.dollar_pos, dev.dollar_pos)
        and np.array_equal(host.dollar_base, dev.dollar_base))
print("bit-identical:", same, flush=True)
del dev, host
codes1g = rng.integers(0, 4, 1_000_000_000, dtype=np.uint8)
t0 = time.perf_counter(); idx = build_index(codes1g, cfg); t_1g = time.perf_counter() - t0
print(f"host 1G: {t_1g:.1f}s", flush=True)
rec = {"probe": 89, "host_250m_s": round(t_host, 1), "device_250m_s": round(t_dev, 1),
       "bit_identical_250m": same, "host_1g_s": round(t_1g, 1),
       "speedup_250m": round(t_host / t_dev, 2)}
with open("/root/repo/.bench/probe89_build250.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")
print(json.dumps(rec))

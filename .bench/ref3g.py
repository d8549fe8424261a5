import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import numpy as np
from tpufm.index.formats import load_npz, write_fmi
from tpufm.io.genreads import write_reads_fasta
from refparity import build_reference_binaries, run

print("loading npz...", flush=True)
index = load_npz("/root/repo/.bench/idx3g.npz")
q = np.load("/root/repo/.bench/q3g.npy")
t0 = time.time()
fmi = "/root/repo/.bench/idx3g.fmi"
write_fmi(fmi, index)
print(f"wrote tag-100 fmi in {time.time()-t0:.0f}s", flush=True)
write_reads_fasta("/root/repo/.bench/q3g.qry", q)
bins = build_reference_binaries(3, 192)
print("running reference fmIndexSearchCPU_192bases_3step on 3 Gbase / 1M reads...", flush=True)
t0 = time.time()
out = run([bins["search"], fmi, "/root/repo/.bench/q3g.qry", 120, q.shape[0]], cwd="/root/repo/.bench")
for line in out.stdout.decode().splitlines():
    if line.startswith("TIME:"):
        ref_s = float(line.split()[-1])
        print(f"reference TIME: {ref_s:.2f}s per pass  ({q.shape[0]/ref_s:,.0f} reads/s)", flush=True)
        print(f"tpufm @ 0.946s -> vs_baseline = {ref_s/0.946:.1f}x", flush=True)

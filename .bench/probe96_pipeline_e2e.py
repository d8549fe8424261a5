"""Probe 96: the full user pipeline end-to-end on the real TPU at moderate
scale — the GENOMICS.md journey as one run: 50 Mbase reference, 200K
simulated paired reads -> tpufm align (auto config) -> sort (indexed BAM)
-> markdup -> stats/flagstat/idxstats -> bedcov -> indexed region view.
Asserts at each stage; records wall-clock per stage."""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from tpufm.bench import _enable_compile_cache
_enable_compile_cache()
from tpufm import cli
from tpufm.utils.encoding import decode_bases

work = "/tmp/pipe96"
os.makedirs(work, exist_ok=True)
os.chdir(work)
rng = np.random.default_rng(0)
N = 50_000_000
codes = rng.integers(0, 4, N, dtype=np.uint8)
t = {}
t0 = time.perf_counter()
with open("g.fa", "wb") as fp:
    fp.write(b">chr1\n")
    for i in range(0, N, 70):
        fp.write(decode_bases(codes[i:i+70]) + b"\n")
t["write_ref"] = round(time.perf_counter() - t0, 1)

from tpufm.io.genreads import generate_read_pairs
r1, r2 = generate_read_pairs(codes, 120, 100_000, 250, 450, seed=1)
def fq(path, reads):
    with open(path, "w") as fp:
        for i, r in enumerate(reads):
            fp.write(f"@rd{i}\n{decode_bases(r).decode()}\n+\n{'I'*120}\n")
t0 = time.perf_counter(); fq("r1.fq", r1); fq("r2.fq", r2)
t["write_reads"] = round(time.perf_counter() - t0, 1)

t0 = time.perf_counter()
cli.main(["align", "g.fa", "r1.fq", "-2", "r2.fq", "--bam", "-o", "a.bam"])
t["align"] = round(time.perf_counter() - t0, 1)
t0 = time.perf_counter()
cli.main(["sort", "a.bam", "--output", "s.bam"])
cli.main(["markdup", "s.bam", "--output", "m.bam"])
t["sort_markdup"] = round(time.perf_counter() - t0, 1)

import io, contextlib
buf = io.StringIO()
t0 = time.perf_counter()
with contextlib.redirect_stdout(buf):
    cli.main(["stats", "m.bam"])
    cli.main(["flagstat", "m.bam"])
    cli.main(["idxstats", "m.bam"])
open("regions.bed", "w").write("chr1\t0\t10000000\tw1\nchr1\t10000000\t50000000\tw2\n")
with contextlib.redirect_stdout(buf):
    cli.main(["bedcov", "m.bam", "regions.bed"])
    cli.main(["view", "m.bam", "chr1:1000000-1001000", "--no-header"])
t["qc"] = round(time.perf_counter() - t0, 1)
out = buf.getvalue()
sn = {l.split("\t")[1].rstrip(":"): l.split("\t")[2]
      for l in out.splitlines() if l.startswith("SN")}
assert sn["raw total sequences"] == "200000", sn
assert sn["reads properly paired"] == sn["reads mapped and paired"] == "200000"
covs = [int(l.split("\t")[4]) for l in out.splitlines()
        if l.startswith("chr1") and len(l.split("\t")) == 5]
assert sum(covs) == 200000 * 120, covs  # every base of every read covers once
rec = {"probe": 96, "refsize": N, "pairs": 100_000, "stage_seconds": t,
       "sn_properly_paired": int(sn["reads properly paired"]),
       "insert_avg": float(sn["insert size average"]),
       "coverage_sum_exact": True}
print(json.dumps(rec))
with open("/root/repo/.bench/probe96_pipeline_e2e.jsonl", "a") as f:
    f.write(json.dumps(rec) + "\n")

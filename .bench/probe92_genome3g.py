"""Probe 92: the 3.2 Gbase single-chip record, as a machine-readable
bracketed record (VERDICT r4 item 3's 'ideally' case — the regime the
reference protocol swept to, slurm_genindexes.sh:42). Host build (uint32
SA-IS; device builder caps at ~400 Mbase), d from recommend_config (320
past ~2.4 Gbase: one-lane-tile rows, the only d that FITS — PERF.md
'Genome scale on one chip'), reference fmIndexSearchCPU fed tpufm's
byte-exact tag-100 image at the same 3.2 Gbase. Bracketed by flagship
controls; index + .fmi cached under .bench/genome for regression runs."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
from tpufm.bench import _enable_compile_cache, run_bench, run_bench_genome
_enable_compile_cache()

ctl_before = run_bench(refsize=10_000_000, k=3, d=192, num_queries=1 << 20,
                       query_len=120, iterations=2, lut_m=12,
                       compare_reference=False, full_verify=False)
print("ctl_before:", ctl_before["detail"]["reads_per_s"], flush=True)
g = run_bench_genome(refsize=3_200_000_000)
print(json.dumps(g), flush=True)
ctl_after = run_bench(refsize=10_000_000, k=3, d=192, num_queries=1 << 20,
                      query_len=120, iterations=2, lut_m=12,
                      compare_reference=False, full_verify=False)
print("ctl_after:", ctl_after["detail"]["reads_per_s"], flush=True)
g["detail"]["control_before_reads_per_s"] = ctl_before["detail"]["reads_per_s"]
g["detail"]["control_after_reads_per_s"] = ctl_after["detail"]["reads_per_s"]
g["detail"]["brackets_healthy"] = (
    ctl_before["detail"]["reads_per_s"] >= 1_200_000
    and ctl_after["detail"]["reads_per_s"] >= 1_200_000
)
with open("/root/repo/.bench/probe92_genome3g.jsonl", "a") as f:
    f.write(json.dumps(g) + "\n")
print("done", flush=True)

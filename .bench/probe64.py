"""Probe 64: post-integration measurement session (hier counter pick).

Waits for the axon tunnel to recover, then serially:
  1. probe63 control variants (base = take_along_axis, tree, flat) — the
     hier row already measured 1.83M (probe63_counterpick.jsonl).
  2. Integrated flagship bench at 10 Mbase (engine now uses hier natively).
  3. Valley-regime bench at 63 Mbase (HBM gather path) to see whether the
     pick change moves the ~700K plateau.
  4. k=2 fast-regime point (was 901K) for the regime map refresh.

All rows appended to probe64_session.jsonl.
"""

import json
import subprocess
import sys
import time

OUT = "/root/repo/.bench/probe64_session.jsonl"


def log(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(OUT, "a") as fh:
        fh.write(line + "\n")


def tunnel_up() -> bool:
    code = subprocess.call(
        [sys.executable, "-c",
         "import jax, jax.numpy as jnp; print(jnp.ones(8).sum())"],
        timeout=None if False else 150,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    return code == 0


def wait_tunnel(max_tries=200):
    for i in range(max_tries):
        try:
            if tunnel_up():
                log({"event": "tunnel_up", "try": i})
                return True
        except subprocess.TimeoutExpired:
            pass
        log({"event": "tunnel_wait", "try": i})
        time.sleep(60)
    return False


if __name__ == "__main__":
    if not wait_tunnel():
        log({"event": "tunnel_never_recovered"})
        sys.exit(1)

    steps = [
        ("probe63_controls", [sys.executable, "/root/repo/.bench/probe63.py",
                              "base", "tree", "flat"]),
        ("flagship_10M", [sys.executable, "-c", """
import sys, json
sys.path.insert(0, '/root/repo')
from tpufm.bench import run_bench
rec = run_bench(refsize=10_000_000, k=3, d=128, num_queries=1<<20,
                query_len=120, iterations=3, engine='xla', lut_m=12,
                compare_reference=False)
out = {'exp':'integrated_flagship_10M', 'reads_per_s':rec['detail']['reads_per_s'],
       'exact':rec['detail']['bit_exact_vs_oracle']}
open('/root/repo/.bench/probe64_session.jsonl','a').write(json.dumps(out)+'\\n')
print(json.dumps(out))
"""]),
        ("valley_63M", [sys.executable, "-c", """
import sys, json
sys.path.insert(0, '/root/repo')
from tpufm.bench import run_bench
rec = run_bench(refsize=63_000_000, k=3, d=320, num_queries=1<<20,
                query_len=120, iterations=3, engine='xla', lut_m=12,
                compare_reference=False)
out = {'exp':'integrated_63M_d320', 'reads_per_s':rec['detail']['reads_per_s'],
       'exact':rec['detail']['bit_exact_vs_oracle']}
open('/root/repo/.bench/probe64_session.jsonl','a').write(json.dumps(out)+'\\n')
print(json.dumps(out))
rec = run_bench(refsize=63_000_000, k=3, d=128, num_queries=1<<20,
                query_len=120, iterations=3, engine='xla', lut_m=12,
                compare_reference=False)
out = {'exp':'integrated_63M_d128_hbm', 'reads_per_s':rec['detail']['reads_per_s'],
       'exact':rec['detail']['bit_exact_vs_oracle']}
open('/root/repo/.bench/probe64_session.jsonl','a').write(json.dumps(out)+'\\n')
print(json.dumps(out))
"""]),
        ("k2_10M", [sys.executable, "-c", """
import sys, json
sys.path.insert(0, '/root/repo')
from tpufm.bench import run_bench
rec = run_bench(refsize=10_000_000, k=2, d=128, num_queries=1<<20,
                query_len=120, iterations=3, engine='xla', lut_m=12,
                compare_reference=False)
out = {'exp':'integrated_k2_10M', 'reads_per_s':rec['detail']['reads_per_s'],
       'exact':rec['detail']['bit_exact_vs_oracle']}
open('/root/repo/.bench/probe64_session.jsonl','a').write(json.dumps(out)+'\\n')
print(json.dumps(out))
"""]),
    ]

    for name, cmd in steps:
        log({"event": "step_start", "step": name})
        t0 = time.time()
        try:
            code = subprocess.call(cmd, timeout=3000)
        except subprocess.TimeoutExpired:
            log({"event": "step_timeout", "step": name})
            log({"event": "abort_session", "reason": "timeout wedges tunnel"})
            sys.exit(2)
        log({"event": "step_done", "step": name, "code": code,
             "secs": round(time.time() - t0, 1)})
    log({"event": "session_done"})

#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Runs the flagship configuration (2-step FM-index, d=64, 10 Mbase reference,
131072 reads x 120 bp — the reference suite's workload shape scaled to a
single pass) on the available accelerator.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from tpufm.bench import run_bench

    record = run_bench(
        refsize=int(os.environ.get("TPUFM_BENCH_REFSIZE", 10_000_000)),
        k=int(os.environ.get("TPUFM_BENCH_K", 2)),
        d=int(os.environ.get("TPUFM_BENCH_D", 64)),
        num_queries=int(os.environ.get("TPUFM_BENCH_QUERIES", 131072)),
        query_len=int(os.environ.get("TPUFM_BENCH_LEN", 120)),
        iterations=int(os.environ.get("TPUFM_BENCH_ITERS", 5)),
        engine=os.environ.get("TPUFM_BENCH_ENGINE", "xla"),
    )
    print(json.dumps(record))


if __name__ == "__main__":
    main()

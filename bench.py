#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Runs the flagship configuration (k-step FM-index backward search,
k/d/LUT from the measured ladder in recommend_config — k=3 d=192 lut12
as of round 4 — 10 Mbase reference, 1M reads x 120 bp) on the available
accelerator, with bounded best-of retries against the oscillating
tunnel state (docs/PERF.md "the tunnel oscillates").
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from tpufm.bench import run_bench

    # Flagship: k=3, d by reference size (128 small / 192 large), fused rows
    # + 12-mer prefix LUT — the fastest measured single-chip configuration
    # (docs/PERF.md, tpufm.config.recommend_config).
    from tpufm.config import recommend_config

    refsize = int(os.environ.get("TPUFM_BENCH_REFSIZE", 10_000_000))
    query_len = int(os.environ.get("TPUFM_BENCH_LEN", 120))
    rec = recommend_config(refsize, query_len=query_len)
    k = int(os.environ.get("TPUFM_BENCH_K", rec["k"]))
    if "TPUFM_BENCH_LUT" in os.environ:
        lut_m = int(os.environ["TPUFM_BENCH_LUT"])
    elif k == rec["k"]:
        lut_m = rec["lut_m"]
    else:
        # user-overridden k: largest m <= 12 compatible with k and the length
        lut_m = next(
            (
                m
                for m in range(12, 0, -1)
                if m % k == 0 and (query_len - m) % k == 0
            ),
            0,
        )
    kwargs = dict(
        refsize=refsize,
        k=k,
        d=int(os.environ.get("TPUFM_BENCH_D", rec["d"])),
        num_queries=int(os.environ.get("TPUFM_BENCH_QUERIES", 1048576)),
        query_len=query_len,
        iterations=int(os.environ.get("TPUFM_BENCH_ITERS", 5)),
        engine=os.environ.get("TPUFM_BENCH_ENGINE", "xla"),
        lut_m=lut_m,
    )
    # The shared TPU tunnel occasionally degrades 10-20x for hours (healthy
    # flagship ~1.9-2.1M reads/s vs ~100-300K degraded, .bench/healthgate);
    # a single unlucky sample would misrepresent the engine. Bounded retry:
    # re-measure a few times spaced out, keep the BEST attempt, and stamp
    # the record with the attempt count + degraded flag so the number is
    # never silently under- or over-stated.
    # The 1.2M floor is calibrated to the DEFAULT flagship config on a
    # healthy TPU only — a user-overridden engine/config (or a CPU run)
    # can be legitimately slower, so those default to no-retry.
    default_cfg = not any(
        f"TPUFM_BENCH_{name}" in os.environ
        for name in ("REFSIZE", "LEN", "K", "D", "QUERIES", "ENGINE", "LUT")
    )
    floor = float(
        os.environ.get(
            "TPUFM_BENCH_HEALTHY_FLOOR", 1_200_000 if default_cfg else 0
        )
    )
    attempts = int(os.environ.get("TPUFM_BENCH_ATTEMPTS", 3))
    pause = float(os.environ.get("TPUFM_BENCH_RETRY_SLEEP", 240))
    import time as _time

    best = None
    for i in range(max(attempts, 1)):
        record = run_bench(**kwargs)
        if best is None or (
            record["detail"]["reads_per_s"] > best["detail"]["reads_per_s"]
        ):
            best = record
        if best["detail"]["reads_per_s"] >= floor:
            break
        if "TPU" not in str(record["detail"].get("device", "")):
            break  # the floor is a TPU-tunnel calibration; CPU runs once
        if i + 1 < attempts:
            _time.sleep(pause)
    best["detail"]["bench_attempts"] = i + 1
    best["detail"]["device_degraded"] = (
        best["detail"]["reads_per_s"] < floor
    )

    # Genome-scale second row (the regime the reference protocol actually
    # swept — slurm_genindexes.sh:42 builds 0.75-3 Gbase references). The
    # HBM-regime healthy floor is ~940-970K reads/s (docs/PERF.md round 4);
    # the row is bracketed: the flagship record above is the before-control
    # and a cheap flagship re-measure after is the after-control, so a
    # tunnel flip mid-row can never masquerade as an engine regression.
    genome_on = (
        os.environ.get("TPUFM_BENCH_GENOME", "1") != "0"
        and default_cfg
        and "TPU" in str(best["detail"].get("device", ""))
    )
    if genome_on:
        from tpufm.bench import run_bench_genome

        genome_refsize = int(
            os.environ.get("TPUFM_BENCH_GENOME_REFSIZE", 250_000_000)
        )
        genome = run_bench_genome(refsize=genome_refsize)
        ctl = run_bench(
            refsize=kwargs["refsize"],
            k=kwargs["k"],
            d=kwargs["d"],
            num_queries=kwargs["num_queries"],
            query_len=kwargs["query_len"],
            iterations=2,
            engine="xla",
            lut_m=kwargs["lut_m"],
            compare_reference=False,
            full_verify=False,
        )
        genome["detail"]["control_before_reads_per_s"] = best["detail"][
            "reads_per_s"
        ]
        genome["detail"]["control_after_reads_per_s"] = ctl["detail"][
            "reads_per_s"
        ]
        brackets_ok = (
            best["detail"]["reads_per_s"] >= floor
            and ctl["detail"]["reads_per_s"] >= floor
        )
        genome["detail"]["brackets_healthy"] = brackets_ok
        genome["detail"]["device_degraded"] = not brackets_ok
        best["detail"]["genome_scale"] = genome
    print(json.dumps(best))


if __name__ == "__main__":
    main()

#!/bin/bash
# Chain 6: after chain 5, the full reference-protocol record — 10M reads
# x 120 bp through bench.py (tree-pick engine, retry-gated), for the
# README/PERF headline.
cd /root/repo/.bench
while ! grep -q runner_r4s5_done runner_r4s5.log 2>/dev/null; do sleep 60; done
echo '{"event":"runner_r4s6_start"}' >> runner_r4s6.log
TPUFM_BENCH_QUERIES=10485760 TPUFM_BENCH_HEALTHY_FLOOR=1200000 \
  timeout 5400 python /root/repo/bench.py >> runner_r4s6.log 2>&1
echo "bench10M exit=$?" >> runner_r4s6.log
echo '{"event":"runner_r4s6_done"}' >> runner_r4s6.log

#!/bin/bash
# Bracketed chain: probe80 (barrier split) after probe79, then the
# 10M-read bench.py record, then the probe78 trace — each self-gated or
# floor-gated against the oscillating tunnel state.
cd /root/repo/.bench
while ! grep -q probe79_done probe79.log 2>/dev/null; do sleep 120; done
echo '{"event":"runner_r4b_start"}' >> runner_r4b.log
timeout 14400 python probe80.py >> runner_r4b.log 2>&1
echo "probe80 exit=$?" >> runner_r4b.log
TPUFM_BENCH_QUERIES=10485760 TPUFM_BENCH_HEALTHY_FLOOR=1200000 \
  TPUFM_BENCH_ATTEMPTS=6 TPUFM_BENCH_RETRY_SLEEP=600 \
  timeout 14400 python /root/repo/bench.py >> runner_r4b.log 2>&1
echo "bench10M exit=$?" >> runner_r4b.log
timeout 3600 python probe78_trace.py >> runner_r4b.log 2>&1
echo "probe78 exit=$?" >> runner_r4b.log
echo '{"event":"runner_r4b_done"}' >> runner_r4b.log

#!/bin/bash
# Chain C: after the probe78 trace, the 10M-read reference-protocol bench
# (d=192 flagship via recommend_config, floor-gated retries), then
# healthy reruns of the real-index HBM probe (71) and paired probe (70),
# each bracketed by healthgate.
cd /root/repo/.bench
while ! grep -q "chain exit=" probe78.log 2>/dev/null; do sleep 120; done
echo '{"event":"runner_r4c_start"}' >> runner_r4c.log
TPUFM_BENCH_QUERIES=10485760 TPUFM_BENCH_HEALTHY_FLOOR=1200000 \
  TPUFM_BENCH_ATTEMPTS=6 TPUFM_BENCH_RETRY_SLEEP=600 \
  timeout 14400 python /root/repo/bench.py >> runner_r4c.log 2>&1
echo "bench10M exit=$?" >> runner_r4c.log
for p in 71_hold 70; do
  until timeout 1800 python healthgate.py >> runner_r4c.log 2>&1; do
    sleep 900
  done
  timeout 3600 python "probe${p}.py" >> runner_r4c.log 2>&1
  echo "probe${p} exit=$?" >> runner_r4c.log
  timeout 1800 python healthgate.py >> runner_r4c.log 2>&1
  echo "probe${p} post-gate exit=$?" >> runner_r4c.log
done
echo '{"event":"runner_r4c_done"}' >> runner_r4c.log

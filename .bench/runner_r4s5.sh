#!/bin/bash
# Chain 5: after the health-gated rerun (s4), measure probe76 (barrier
# split of gather/consumer), then rerun the real-index HBM probes 71/70
# whose first runs landed in the degraded-device window.
cd /root/repo/.bench
while ! grep -q runner_r4s4_done runner_r4s4.log 2>/dev/null; do sleep 60; done
echo '{"event":"runner_r4s5_start"}' >> runner_r4s5.log
for p in 76 71_hold 70; do
  timeout 3600 python "probe${p}.py" >> runner_r4s5.log 2>&1
  echo "probe${p} exit=$?" >> runner_r4s5.log
done
echo '{"event":"runner_r4s5_done"}' >> runner_r4s5.log

#!/bin/bash
# Health-gated decisive chain: after chain 3, poll the device every ~15 min
# with healthgate.py; when the flagship fake-table rate is back over 1.2M
# reads/s, rerun the decisive measurements (73 d-sweep, 74 budget knob,
# 75 pick A/B) on the HEALTHY device.
cd /root/repo/.bench
while ! grep -q runner_r4s3_done runner_r4s3.log 2>/dev/null; do sleep 60; done
echo '{"event":"runner_r4s4_start"}' >> runner_r4s4.log
while true; do
  if timeout 1800 python healthgate.py >> runner_r4s4.log 2>&1; then
    echo '{"event":"device_healthy"}' >> runner_r4s4.log
    break
  fi
  sleep 900
done
for p in 73 74 75; do
  timeout 3600 python "probe${p}.py" >> runner_r4s4.log 2>&1
  echo "probe${p} exit=$?" >> runner_r4s4.log
done
echo '{"event":"runner_r4s4_done"}' >> runner_r4s4.log

#!/bin/bash
# Round-4 follow-up chain: waits for runner_r4s1 to finish, then runs the
# fixed probe73 (flagship d sweep) and probe74 (VMEM-budget boundary sweep).
cd /root/repo/.bench
while ! grep -q runner_r4s1_done runner_r4s1.log 2>/dev/null; do sleep 60; done
echo '{"event":"runner_r4s2_start"}' >> runner_r4s2.log
for p in 73 74; do
  timeout 3600 python "probe${p}.py" >> runner_r4s2.log 2>&1
  echo "probe${p} exit=$?" >> runner_r4s2.log
done
echo '{"event":"runner_r4s2_done"}' >> runner_r4s2.log

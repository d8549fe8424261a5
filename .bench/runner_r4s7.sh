#!/bin/bash
# Chain 7: after the 10M-read bench, the refreshed profiler capture
# (tree-pick flagship + HBM pass).
cd /root/repo/.bench
while ! grep -q runner_r4s6_done runner_r4s6.log 2>/dev/null; do sleep 60; done
echo '{"event":"runner_r4s7_start"}' >> runner_r4s7.log
timeout 3600 python probe78_trace.py >> runner_r4s7.log 2>&1
echo "probe78 exit=$?" >> runner_r4s7.log
echo '{"event":"runner_r4s7_done"}' >> runner_r4s7.log

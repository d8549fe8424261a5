#!/bin/bash
# Chain D: probe82 (per-end carry A/B) after chain C completes.
cd /root/repo/.bench
while ! grep -q runner_r4c_done runner_r4c.log 2>/dev/null; do sleep 120; done
echo '{"event":"runner_r4d_start"}' >> runner_r4d.log
timeout 14400 python probe82.py >> runner_r4d.log 2>&1
echo "probe82 exit=$?" >> runner_r4d.log
echo '{"event":"runner_r4d_done"}' >> runner_r4d.log

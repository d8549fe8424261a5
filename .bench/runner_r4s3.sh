#!/bin/bash
# Round-4 chain 3: waits for chain 2, then probe75 (tree-vs-take pick A/B
# across the VMEM/HBM regimes).
cd /root/repo/.bench
while ! grep -q runner_r4s2_done runner_r4s2.log 2>/dev/null; do sleep 60; done
echo '{"event":"runner_r4s3_start"}' >> runner_r4s3.log
timeout 3600 python probe75.py >> runner_r4s3.log 2>&1
echo "probe75 exit=$?" >> runner_r4s3.log
echo '{"event":"runner_r4s3_done"}' >> runner_r4s3.log

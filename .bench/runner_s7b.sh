#!/bin/bash
# Session-7 chain B: after runner_s7 (67, 70; 71 skipped via rename),
# run probe73 (flagship d sweep) first, then probe71 (HBM regime), then
# probe72 (compiler_options MSA budget experiment).
cd /root/repo/.bench
while ! grep -q "runner_s7_done" runner_s7.log 2>/dev/null; do
  sleep 30
done
timeout 2400 python probe73.py >> runner_s7b.log 2>&1
echo "probe73 exit=$?" >> runner_s7b.log
timeout 4200 python probe71_hold.py >> runner_s7b.log 2>&1
echo "probe71 exit=$?" >> runner_s7b.log
timeout 3600 python probe72.py >> runner_s7b.log 2>&1
echo "probe72 exit=$?" >> runner_s7b.log
echo "runner_s7b done" >> runner_s7b.log

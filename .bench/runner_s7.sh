#!/bin/bash
# Session-7 probe chain: 67 (feature costs) -> 70 (paired) -> 71 (HBM regime).
cd /root/repo/.bench
echo '{"event":"runner_s7_start"}' >> runner_s7.log
timeout 2400 python probe67.py >> runner_s7.log 2>&1
echo "probe67 exit=$?" >> runner_s7.log
timeout 2400 python probe70.py >> runner_s7.log 2>&1
echo "probe70 exit=$?" >> runner_s7.log
timeout 3600 python probe71.py >> runner_s7.log 2>&1
echo "probe71 exit=$?" >> runner_s7.log
echo '{"event":"runner_s7_done"}' >> runner_s7.log

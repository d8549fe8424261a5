#!/bin/bash
# Chains probe72 (compiler_options MSA budget experiment) after runner_s7.
cd /root/repo/.bench
while ! grep -q "runner_s7_done" runner_s7.log 2>/dev/null; do
  sleep 60
done
timeout 3600 python probe72.py >> watcher72.log 2>&1
echo "watcher72 done, probe72 exit=$?" >> watcher72.log

#!/bin/bash
# Chains probe70 (paired-end TPU throughput) after watcher69/probe69.
# Serialized on the watcher69 completion marker so only one TPU process
# ever runs.
cd /root/repo/.bench
while ! grep -q "watcher69 done" watcher69.log 2>/dev/null; do
  sleep 60
done
echo '{"event":"watcher70_starting"}' >> probe70_session.jsonl
timeout 4500 python probe70.py >> watcher70.log 2>&1
echo "watcher70 done, probe70 exit=$?" >> watcher70.log

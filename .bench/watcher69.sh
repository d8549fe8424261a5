#!/bin/bash
# Chains probe69 (edit-distance TPU throughput) after watcher68/probe68.
# Serialized on the watcher68 completion marker so only one TPU process
# ever runs.
cd /root/repo/.bench
while ! grep -q "watcher68 done" watcher68.log 2>/dev/null; do
  sleep 60
done
echo '{"event":"watcher69_starting"}' >> probe69_session.jsonl
timeout 4500 python probe69.py >> watcher69.log 2>&1
echo "watcher69 done, probe69 exit=$?" >> watcher69.log

#!/bin/bash
# Chains probe67 (round-3 feature costs) after watcher66/probe66 finishes.
# Serialized on the watcher66 completion marker so only one TPU process
# ever runs.
cd /root/repo/.bench
while ! grep -q "watcher66 done" watcher66.log 2>/dev/null; do
  sleep 60
done
echo '{"event":"watcher67_starting"}' >> probe67_session.jsonl
timeout 4500 python probe67.py >> watcher67.log 2>&1
echo "watcher67 done, probe67 exit=$?" >> watcher67.log

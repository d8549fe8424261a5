#!/bin/bash
# Chains probe68 (seed-and-extend TPU throughput) after watcher67/probe67.
# Serialized on the watcher67 completion marker so only one TPU process
# ever runs.
cd /root/repo/.bench
while ! grep -q "watcher67 done" watcher67.log 2>/dev/null; do
  sleep 60
done
echo '{"event":"watcher68_starting"}' >> probe68_session.jsonl
timeout 4500 python probe68.py >> watcher68.log 2>&1
echo "watcher68 done, probe68 exit=$?" >> watcher68.log

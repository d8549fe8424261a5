#!/bin/bash
# Chains probe66 (genome-scale re-measure with the hier pick) after the
# probe64->65 runner finishes. Serialized: waits for the "runner done"
# marker in probe65_session.jsonl so two TPU processes never coexist.
cd /root/repo/.bench
while ! grep -q "runner done" probe65_session.jsonl 2>/dev/null; do
  sleep 60
done
echo '{"event":"watcher66_starting"}' >> probe66_session.jsonl
timeout 4500 python probe66.py >> watcher66.log 2>&1
echo "watcher66 done, probe66 exit=$?" >> watcher66.log

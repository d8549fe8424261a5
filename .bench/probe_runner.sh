#!/bin/bash
# Waits (indefinitely) for the axon tunnel, then runs probe64 then probe65.
# probe64.py has its own wait loop (200 tries x 60s); we re-invoke it until
# it gets past the wait, then chain probe65.
cd /root/repo/.bench
while true; do
  python probe64.py
  code=$?
  if [ $code -eq 0 ]; then
    break
  elif [ $code -eq 2 ]; then
    # step timeout — tunnel wedged mid-session; wait and retry remaining work
    echo '{"event":"runner_retry_after_wedge"}' >> probe64_session.jsonl
    sleep 600
  else
    # tunnel never recovered within probe64's own loop; keep waiting
    echo '{"event":"runner_retry_after_wait_exhausted"}' >> probe64_session.jsonl
    sleep 60
  fi
done
echo '{"event":"probe64_complete_starting_65"}' >> probe64_session.jsonl
timeout 3000 python probe65.py >> probe65_session.jsonl 2>&1
echo "runner done, probe65 exit=$?" >> probe65_session.jsonl

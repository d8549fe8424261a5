#!/bin/bash
# Round-4 session-1 probe chain: 73 (flagship d sweep, tree pick) ->
# 72 (MSA budget via compiler_options) -> 71 (HBM regime re-measure) ->
# 70 (paired-end throughput).
cd /root/repo/.bench
echo '{"event":"runner_r4s1_start"}' >> runner_r4s1.log
for p in 73 72 71_hold 70; do
  timeout 3600 python "probe${p}.py" >> runner_r4s1.log 2>&1
  echo "probe${p} exit=$?" >> runner_r4s1.log
done
echo '{"event":"runner_r4s1_done"}' >> runner_r4s1.log

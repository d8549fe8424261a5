#!/bin/bash
# Session-5 probe chain: runs after probe64. Serial TPU use.
cd /root/repo/.bench
set -x
timeout 2400 python probe68.py >> probe68_session.jsonl.log 2>&1
echo "probe68 exit=$?"
timeout 2400 python probe69.py >> probe69_session.jsonl.log 2>&1
echo "probe69 exit=$?"
timeout 2400 python probe70.py >> probe70_session.jsonl.log 2>&1
echo "probe70 exit=$?"
# tree-integrated flagship confirmation (the engine now uses the tree pick)
timeout 2400 python - <<'EOF'
import sys, json
sys.path.insert(0, '/root/repo')
from tpufm.bench import run_bench
rec = run_bench(refsize=10_000_000, k=3, d=128, num_queries=1<<20,
                query_len=120, iterations=5, engine='xla', lut_m=12,
                compare_reference=False)
out = {'exp': 'integrated_flagship_10M_tree', 'reads_per_s': rec['detail']['reads_per_s'],
       'exact': rec['detail']['bit_exact_vs_oracle']}
open('/root/repo/.bench/probe64_session.jsonl', 'a').write(json.dumps(out)+'\n')
print(json.dumps(out))
EOF
echo "flagship-tree exit=$?"
timeout 2400 python probe65.py fused wave >> probe65_session.jsonl.log 2>&1
echo "probe65fw exit=$?"
timeout 2400 python probe67.py >> probe67_session.jsonl.log 2>&1
echo "probe67 exit=$?"
timeout 2400 python probe65.py regime >> probe65_session.jsonl.log 2>&1
echo "probe65r exit=$?"
echo "chain done"

#!/bin/bash
# Session-6 probe chain: aligner throughput + feature costs. Serial TPU use.
cd /root/repo/.bench
set -x
timeout 1800 python probe68.py >> probe68_session.jsonl.log 2>&1
echo "probe68 exit=$?"
timeout 1800 python probe69.py >> probe69_session.jsonl.log 2>&1
echo "probe69 exit=$?"
timeout 1800 python probe70.py >> probe70_session.jsonl.log 2>&1
echo "probe70 exit=$?"
timeout 1800 python probe65.py fused wave >> probe65_session.jsonl.log 2>&1
echo "probe65fw exit=$?"
timeout 1800 python probe67.py >> probe67_session.jsonl.log 2>&1
echo "probe67 exit=$?"
timeout 1800 python probe65.py regime >> probe65_session.jsonl.log 2>&1
echo "probe65r exit=$?"
echo "chain done"

cd /root/repo
JAX_COMPILATION_CACHE_DIR=/root/repo/.bench/jaxcache python -m tpufm.cli sweep \
  --refsizes 1000000 --ks 3 --ds 128 --engines xla pallas --luts 0 12 \
  --numqueries 262144 --length 120 --iterations 3 \
  --output /root/repo/.bench/sweep_r2.jsonl

set -e
cd /tmp && rm -rf tpufm_e2e && mkdir tpufm_e2e && cd tpufm_e2e
export JAX_COMPILATION_CACHE_DIR=/root/repo/.bench/jaxcache
/opt/venv/bin/python - <<'PY'
import sys, numpy as np
sys.path.insert(0, "/root/repo")
from tpufm.io.fasta import write_reference
from tpufm.utils.encoding import decode_bases
rng = np.random.default_rng(0)
write_reference("ref.fa", decode_bases(rng.integers(0, 4, 10_000_000, dtype=np.uint8)))
PY
PYTHONPATH=/root/repo:$PYTHONPATH /opt/venv/bin/python -m tpufm.cli build ref.fa 10000000 --auto
PYTHONPATH=/root/repo:$PYTHONPATH /opt/venv/bin/python -m tpufm.cli genreads ref.fa 10000000 120 262144 --seed 5
PYTHONPATH=/root/repo:$PYTHONPATH /opt/venv/bin/python -m tpufm.cli search ref.fa.10000000.128fmi3steps.fmi Q-262144_B-120_R-10000000.qry 120 262144 --lut 12 --iterations 2
PYTHONPATH=/root/repo:$PYTHONPATH /opt/venv/bin/python -m tpufm.cli search ref.fa.10000000.128fmi3steps.fmi Q-262144_B-120_R-10000000.qry 120 262144 --iterations 1 --output nolut.res
PYTHONPATH=/root/repo:$PYTHONPATH /opt/venv/bin/python -m tpufm.cli diff ref.fa.10000000.128fmi3steps.fmi.res.tpu nolut.res
echo CLI-E2E-OK

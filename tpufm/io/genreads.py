"""Query workload generator — the tpufm equivalent of the reference's
resources/genreads.py (Python 2): sample `num` random substrings of length
`length` from a reference, seeded for reproducibility, and emit multi-FASTA
with '>ridN start-end' headers (reference resources/genreads.py:30-84)."""

from __future__ import annotations

import numpy as np

from tpufm.utils.encoding import decode_bases


def generate_reads(
    codes: np.ndarray, length: int, num: int, seed: int = 0,
    return_starts: bool = False,
):
    """Sample `num` reads of `length` bases from 2-bit codes. Returns
    uint8 [num, length] (and the int64 [num] start positions when
    return_starts is set)."""
    n = codes.shape[0]
    if length > n:
        raise ValueError(f"read length {length} exceeds reference size {n}")
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, n - length + 1, size=num, dtype=np.int64)
    idx = starts[:, None] + np.arange(length, dtype=np.int64)[None, :]
    reads = codes[idx]
    return (reads, starts) if return_starts else reads


def write_reads_fasta(path, reads: np.ndarray, starts=None) -> None:
    """Write reads (uint8 codes [n, len]) as multi-FASTA, reference-style
    headers '>ridN start-end'."""
    n, length = reads.shape
    with open(path, "wb") as fp:
        for i in range(n):
            s = int(starts[i]) if starts is not None else 0
            fp.write(b">rid%d %d-%d\n" % (i, s, s + length))
            fp.write(decode_bases(reads[i]) + b"\n")

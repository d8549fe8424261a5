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


def generate_read_pairs(
    codes: np.ndarray, length: int, num: int, insert_min: int,
    insert_max: int, seed: int = 0, return_truth: bool = False,
):
    """Sample `num` FR read pairs: per pair, a fragment of uniform length
    in [max(insert_min, length), insert_max] (a fragment cannot be shorter
    than a mate) is placed uniformly, R1 is its head and R2
    the reverse complement of its tail; pairs alternate the sequenced
    strand (even index: R1 on plus, odd: R1 on minus — i.e. (R1, R2)
    swapped through rc). Returns (r1, r2) uint8 [num, length] and, with
    return_truth, (left_start int64 [num], right_start int64 [num],
    strand uint8 [num]) matching engine/paired.py's output convention."""
    from tpufm.utils.encoding import reverse_complement

    n = codes.shape[0]
    lo = max(insert_min, length)
    if not (length <= lo <= insert_max <= n):
        raise ValueError(
            f"need read length {length} <= insert range [{insert_min}, "
            f"{insert_max}] <= reference size {n}"
        )
    rng = np.random.default_rng(seed)
    frag = rng.integers(lo, insert_max + 1, size=num, dtype=np.int64)
    starts = rng.integers(0, n - frag + 1, dtype=np.int64)
    idx = np.arange(length, dtype=np.int64)[None, :]
    head = codes[starts[:, None] + idx]
    tail_rc = reverse_complement(codes[(starts + frag - length)[:, None] + idx])
    minus = (np.arange(num) % 2).astype(bool)
    r1 = np.where(minus[:, None], tail_rc, head)
    r2 = np.where(minus[:, None], head, tail_rc)
    if not return_truth:
        return r1, r2
    return r1, r2, (starts, starts + frag - length, minus.astype(np.uint8))


def write_reads_fasta(path, reads: np.ndarray, starts=None) -> None:
    """Write reads (uint8 codes [n, len]) as multi-FASTA, reference-style
    headers '>ridN start-end'."""
    n, length = reads.shape
    with open(path, "wb") as fp:
        for i in range(n):
            s = int(starts[i]) if starts is not None else 0
            fp.write(b">rid%d %d-%d\n" % (i, s, s + length))
            fp.write(decode_bases(reads[i]) + b"\n")

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


# decode table for write_reads_fasta's bytes.translate fast path: codes
# are 0-3 by contract there (generate_reads output); entries 4-255 are
# don't-care filler
_DECODE_TBL = bytes(b"ACGT"[i & 3] for i in range(256))


def _put_digits(big, valid, col, val, width):
    """Fill `width` right-aligned decimal-digit columns of the byte
    matrix `big` starting at `col` from int64 `val`, and mark the
    leading-zero columns invalid in `valid`. Returns the column after
    the field."""
    nd = np.ones(val.shape[0], np.int64)  # 0 formats as '1 digit'
    p = 10
    for _ in range(width - 1):
        nd += val >= p
        p *= 10
    # int32 divmod is ~2x int64 on this host; fall back for >=2^31 values
    q = val.copy() if int(val.max()) >= 2**31 else val.astype(np.int32)
    for j in range(width - 1, -1, -1):  # least-significant first
        big[:, col + j] = q % 10 + 0x30
        q //= 10
    valid[:, col:col + width] = (
        np.arange(width, dtype=np.int64)[None, :] >= (width - nd)[:, None]
    )
    return col + width


def write_reads_fasta(path, reads: np.ndarray, starts=None) -> None:
    """Write reads (uint8 codes [n, len]) as multi-FASTA, reference-style
    headers '>ridN start-end'.

    Vectorized (no per-read Python loop — at the 10M-read reference
    protocol the old loop dominated reference-comparison setup): each
    record renders into a fixed-width byte-matrix row — digit fields
    right-aligned, extracted by vectorized divmod — and the variable
    header widths fall out of one boolean compress that drops the
    leading-zero padding columns. Bases decode via bytes.translate
    (memcpy-speed LUT), matching decode_bases for the 0-3 codes
    generate_reads emits."""
    n, length = reads.shape
    if n == 0:
        open(path, "wb").close()
        return
    starts_arr = (np.asarray(starts, dtype=np.int64) if starts is not None
                  else np.zeros(n, np.int64))
    ends_arr = starts_arr + length
    d_id = len(str(n - 1))
    d_s = len(str(int(starts_arr.max())))
    d_e = len(str(int(ends_arr.max())))
    width = 4 + d_id + 1 + d_s + 1 + d_e + 1 + length + 1
    # small chunks keep big+valid cache-resident: measured 0.72 s/1M reads
    # at a 4 MB budget vs 2.06 s at 256 MB on this host
    chunk = max(1, (4 << 20) // (2 * width))
    with open(path, "wb") as fp:
        for base in range(0, n, chunk):
            stop = min(base + chunk, n)
            m = stop - base
            big = np.empty((m, width), np.uint8)
            valid = np.ones((m, width), bool)
            big[:, 0:4] = np.frombuffer(b">rid", np.uint8)
            col = _put_digits(big, valid, 4,
                              np.arange(base, stop, dtype=np.int64), d_id)
            big[:, col] = 0x20
            col = _put_digits(big, valid, col + 1, starts_arr[base:stop], d_s)
            big[:, col] = 0x2D
            col = _put_digits(big, valid, col + 1, ends_arr[base:stop], d_e)
            big[:, col] = 0x0A
            big[:, col + 1:col + 1 + length] = np.frombuffer(
                np.ascontiguousarray(reads[base:stop]).tobytes()
                .translate(_DECODE_TBL), np.uint8,
            ).reshape(m, length)
            big[:, width - 1] = 0x0A
            fp.write(big.reshape(-1)[valid.reshape(-1)].data)

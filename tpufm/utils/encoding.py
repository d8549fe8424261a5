"""2-bit DNA base encoding.

The alphabet order is A=0, C=1, G=2, T=3 — the same order the reference
derives from ASCII bit tricks (reference src/genFMindex.c:71-84: the function
base2index maps 'A'->0, 'C'->1, 'G'->2, 'T'->3). The '$' BWT terminator is
represented as 'A' inside bitmaps (reference src/genFMindex.c:505-509), with
per-level dollar position/base metadata correcting the counts at query time.
"""

from __future__ import annotations

import numpy as np

BASE_ORDER = b"ACGT"

# ASCII -> 2-bit code lookup, byte-identical to the reference's bit tricks
# (reference src/genFMindex.c:71-84): every byte maps via
#   bit1 = base & 4;  bit0 = bit1 ? ((base & 2) ^ 2) : (base & 2)
#   code = (bit1 | bit0) >> 1
# which sends A/a->0, C/c->1, G/g->2, T/t->3 and, deliberately identically to
# the reference, any other byte (e.g. 'N'->2) by the same formula.
_b = np.arange(256, dtype=np.uint32)
_bit1 = _b & 4
_bit0 = np.where(_bit1 != 0, (_b & 2) ^ 2, _b & 2)
_ASCII_TO_CODE = ((_bit1 | _bit0) >> 1).astype(np.uint8)

_CODE_TO_ASCII = np.frombuffer(BASE_ORDER, dtype=np.uint8).copy()


_ASCII_TO_CODE_TBL = _ASCII_TO_CODE.tobytes()


def encode_bases(seq) -> np.ndarray:
    """ASCII bytes / str -> uint8 codes in {0,1,2,3}.

    bytes go through bytes.translate — ~4.5x the numpy LUT gather on
    this host (0.17 s vs 0.76 s per 125 MB), and encoding is the hot
    host stage of every loader."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    if isinstance(seq, (bytes, bytearray)):
        return np.frombuffer(bytes(seq).translate(_ASCII_TO_CODE_TBL),
                             dtype=np.uint8)
    return _ASCII_TO_CODE[np.asarray(seq, dtype=np.uint8)]


def decode_bases(codes: np.ndarray) -> bytes:
    """uint8 codes -> ASCII bytes."""
    return _CODE_TO_ASCII[np.asarray(codes, dtype=np.uint8)].tobytes()


def reverse_complement(codes: np.ndarray) -> np.ndarray:
    """Reverse-complement 2-bit codes along the last axis.

    With A=0, C=1, G=2, T=3 the complement is 3 - code (A<->T, C<->G), so
    rc(q) = 3 - q[..., ::-1]. Searching rc(q) finds the minus-strand
    occurrences of q; the returned locate coordinate is the leftmost base
    of the match on the forward text, the convention aligners report for
    minus-strand hits."""
    codes = np.asarray(codes, dtype=np.uint8)
    return (np.uint8(3) - codes[..., ::-1]).astype(np.uint8)


def reverse_complement_varlen(batch: np.ndarray) -> np.ndarray:
    """Reverse-complement a RIGHT-ALIGNED 0xFF-padded variable-length batch
    [B, Lmax] (the search_varlen contract), keeping the result right-aligned.

    Plain reverse_complement would flip each row's padding to the right
    side; here each row's real suffix is reversed/complemented in place and
    the pad stays on the left, via one vectorized right-shift."""
    batch = np.asarray(batch, dtype=np.uint8)
    B, L = batch.shape
    pad = np.uint8(0xFF)
    rev = batch[:, ::-1]  # real chars now LEFT-aligned
    comp = np.where(rev != pad, np.uint8(3) - rev, pad).astype(np.uint8)
    lengths = (batch != pad).sum(axis=1)
    src = np.arange(L)[None, :] - (L - lengths)[:, None]
    out = np.where(
        src >= 0,
        comp[np.arange(B)[:, None], np.clip(src, 0, L - 1)],
        pad,
    ).astype(np.uint8)
    return out


def fuse_kmer_codes(levels: np.ndarray) -> np.ndarray:
    """Fuse per-level 2-bit codes into one k-tuple code.

    levels: integer array [k, ...] where levels[i] is the code of BWT level i.
    Returns sum_i levels[i] << (2*i) — level 0 occupies the low 2 bits, the
    same packing as the reference's indexBase (src/fmIndexCPUBaseline.c:213-225).
    """
    levels = np.asarray(levels)
    k = levels.shape[0]
    out = np.zeros(levels.shape[1:], dtype=np.uint32)
    for i in range(k):
        out |= levels[i].astype(np.uint32) << np.uint32(2 * i)
    return out

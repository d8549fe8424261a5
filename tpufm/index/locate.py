"""Sampled-suffix-array locate support — where in the text does each hit lie?

The reference suite only reports SA intervals (count = R - L); locate() is a
tpufm EXTENSION (docs/ROADMAP.md) using the classic FM-index sampled-SA
scheme: mark every BWT position i whose suffix start SA[i] is a multiple of
`s`; store those SA values in rank order. To resolve BWT position p, walk the
single-step LF mapping until a marked position is reached (at most s - 1
steps, since LF moves the suffix start back by one each step and position 0
is always sampled), then text_pos = samples[rank(p)] + steps.

The LF(1) walk reuses the k=1 Occ machinery: a k=1 KStepFMIndex over the
same suffix array IS the single-character LF table (occ rows are
Cb-accumulated, '$'-excluded — exactly LF(p) = C[c] + rank_c(p)), and the
BWT character at p is read from its two bit-planes.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tpufm.config import IndexConfig
from tpufm.index.builder import (
    KStepFMIndex,
    build_index,
    normalize_reference,
    pack_bitplane_words,
)
from tpufm.index.suffix_array import suffix_array

_U32 = np.uint32


@dataclasses.dataclass
class LocateIndex:
    """Auxiliary locate tables.

    lf1:        k=1 KStepFMIndex (single-step LF mapping).
    sample_rate: s — every SA value divisible by s is sampled.
    mark_words: uint32 [nentries + 1, d/32] — bit (31 - p%32) of word
                (p%d)/32 set iff BWT position p is sampled (MSB-first, the
                same packing as the search bitmaps).
    mark_rank:  uint32 [nentries + 1] — number of sampled positions before
                each block (exclusive prefix).
    samples:    uint32 [n_sampled] — SA[p] for sampled p, in p order.
    """

    lf1: KStepFMIndex
    sample_rate: int
    mark_words: np.ndarray
    mark_rank: np.ndarray
    samples: np.ndarray


def build_locate(
    reference,
    sample_rate: int = 32,
    d: int = 128,
    sa: np.ndarray | None = None,
    sa_method: str = "auto",
) -> LocateIndex:
    """Build locate tables for a reference (2-bit codes or ACGT text)."""
    codes = normalize_reference(reference)
    n = int(codes.shape[0])
    bwtsize = n + 1
    if sa is None:
        sa = suffix_array(codes, method=sa_method)

    lf1 = build_index(codes, IndexConfig(k=1, d=d), sa=sa)
    nentries = lf1.nentries
    nb = lf1.config.words_per_plane

    marked = (sa % sample_rate) == 0  # bool [bwtsize]; sa[?]==0 always marked
    samples = sa[marked].astype(_U32)

    padded = np.zeros(nentries * d, dtype=np.uint8)
    padded[:bwtsize] = marked
    mark_words = np.zeros((nentries + 1, nb), dtype=_U32)
    mark_words[:nentries] = pack_bitplane_words(
        padded.reshape(nentries, nb, 32)
    )

    per_block = np.add.reduceat(
        padded.astype(np.int64), np.arange(0, nentries * d, d)
    )
    mark_rank = np.zeros(nentries + 1, dtype=_U32)
    mark_rank[1:] = np.cumsum(per_block).astype(_U32)

    return LocateIndex(
        lf1=lf1,
        sample_rate=sample_rate,
        mark_words=mark_words,
        mark_rank=mark_rank,
        samples=samples,
    )


def locate_oracle(loc: LocateIndex, positions: np.ndarray) -> np.ndarray:
    """Text position of each BWT position (NumPy reference implementation).

    positions: uint32/int [...] BWT rows p with SA[p] wanted.
    """
    from tpufm.engine.oracle import lf_step_oracle

    lf1 = loc.lf1
    d = lf1.config.d
    nb = lf1.config.words_per_plane
    p = np.asarray(positions, dtype=np.int64).copy()
    steps = np.zeros(p.shape, dtype=np.int64)
    out = np.full(p.shape, 0xFFFFFFFF, dtype=np.int64)
    done = np.zeros(p.shape, dtype=bool)

    for _ in range(loc.sample_rate):
        block, off = p // d, p % d
        word = loc.mark_words[block, off // 32]
        marked = ((word >> np.uint32(31 - (off % 32))) & 1).astype(bool)
        hit = marked & ~done
        if hit.any():
            # rank(p) = rank at block start + marked bits before off
            pre = _popcount_prefix(loc.mark_words[block[hit]], off[hit], nb)
            rank = loc.mark_rank[block[hit]].astype(np.int64) + pre
            out[hit] = loc.samples[rank] + steps[hit]
            done |= hit
        if done.all():
            break
        # single-step LF on the unfinished lanes: read BWT char, apply occ
        act = ~done
        pb, po = p[act] // d, p[act] % d
        w0 = lf1.bitmaps[pb, 0, 0, po // 32]
        w1 = lf1.bitmaps[pb, 0, 1, po // 32]
        sh = np.uint32(31 - (po % 32))
        c = (((w0 >> sh) & 1) | (((w1 >> sh) & 1) << 1)).astype(_U32)
        p[act] = lf_step_oracle(lf1, p[act].astype(_U32), c).astype(np.int64)
        steps[act] += 1
    return out.astype(_U32)


def _popcount_prefix(words_rows: np.ndarray, off: np.ndarray, nb: int) -> np.ndarray:
    """#set bits strictly before in-block offset `off` in each [nb]-word row."""
    from tpufm.bitops import boundary_masks, popcount_rows

    masks = boundary_masks(off.astype(_U32), nb)  # keeps the top `off` bits
    return popcount_rows(words_rows & masks)


def expand_intervals(intervals: np.ndarray, max_hits: int):
    """uint32 [B, 2] -> (rows uint32 [B, max_hits], valid bool [B, max_hits]):
    the first max_hits BWT rows of each interval, 0-filled past its count.
    Shared by the oracle and device locate paths."""
    intervals = np.asarray(intervals)
    lo = intervals[:, 0].astype(np.int64)
    width = (intervals[:, 1].astype(np.int64) - lo).clip(0, max_hits)
    cols = np.arange(max_hits, dtype=np.int64)[None, :]
    valid = cols < width[:, None]
    rows = np.where(valid, lo[:, None] + cols, 0).astype(np.uint32)
    return rows, valid


def locate_hits_compacted(locate_rows, intervals, max_hits: int) -> np.ndarray:
    """Host-side compacted interval resolution shared by the single-chip
    and mesh engines: expand intervals, walk ONLY the lanes inside their
    interval through `locate_rows` (uint32 [N] -> uint32 [N]), padded to a
    16K quantum so dispatch shapes stay a small fixed set, and scatter the
    positions back 0xFFFFFFFF-padded."""
    rows, valid = expand_intervals(intervals, max_hits)
    pos = np.zeros(rows.shape, np.uint32)
    nv = int(valid.sum())
    if nv:
        vrows = rows[valid]
        padn = -nv % (1 << 14)
        if padn:
            vrows = np.concatenate([vrows, np.zeros(padn, np.uint32)])
        pos[valid] = locate_rows(vrows)[:nv]
    return np.where(valid, pos, np.uint32(0xFFFFFFFF))


def locate_hits(
    loc: LocateIndex, intervals: np.ndarray, max_hits: int
) -> np.ndarray:
    """Text positions of up to max_hits occurrences per interval.

    intervals: uint32 [B, 2] from a search. Returns uint32 [B, max_hits],
    padded with 0xFFFFFFFF past each interval's count (R - L).
    """
    rows, valid = expand_intervals(intervals, max_hits)
    pos = locate_oracle(loc, rows.reshape(-1)).reshape(rows.shape)
    return np.where(valid, pos, np.uint32(0xFFFFFFFF)).astype(_U32)

"""Host-side alignment reconstruction: CIGAR strings for edit-distance
sites.

The device edit engine (tpufm/engine/edit.py) reports START sites and
distances but not alignment paths — the Myers bit-vector scan never
materializes the DP matrix. SAM CIGARs need the path, so the few ACCEPTED
sites (max_hits per read, not the candidate grid) are re-aligned here:
a start-anchored free-end Levenshtein DP, vectorized across sites (the
row loop is over the L pattern characters; every site and window column
is a numpy lane), with an int8 pointer matrix for traceback. Cost is
O(L * (L+E)) cells per site at numpy speed plus an O(L+E) Python
traceback per site — host-side work proportional to the HIT list, not
the read count.

CIGAR conventions (SAM v1.6): operations relative to the read as stored
in SEQ — M consumes read+ref (match or mismatch), I consumes read only,
D consumes ref only. Start-anchored alignments have no clips (a path
whose optimum begins with deletions keeps those leading D ops — the
CIGAR always accounts for the full ref_span). NM:i is edits
(substitutions + I + D lengths). Ties in the DP break toward M, then I,
then D (deterministic)."""

from __future__ import annotations

import numpy as np


def edit_alignments(codes, reads, starts, edits: int):
    """Optimal start-anchored free-end alignments of reads[i] against
    codes[starts[i]:].

    codes: uint8 [n] 2-bit reference. reads: uint8 [N, L] in the
    orientation that matches the FORWARD reference (callers pass the
    reverse complement for minus-strand sites). starts: int/uint [N]
    absolute start positions. edits: the engine's E (bounds the window:
    the free end lies within starts[i] + L + E).

    Returns (cigars list[str], nm int32 [N], ref_span int32 [N] — the
    number of reference bases the alignment consumes, for span checks)."""
    codes = np.asarray(codes, np.uint8)
    reads = np.asarray(reads, np.uint8)
    starts = np.asarray(starts, np.int64)
    N, L = reads.shape
    E = edits
    TL = L + E
    if N == 0:
        return [], np.zeros(0, np.int32), np.zeros(0, np.int32)

    # window gather, out-of-range chars become a never-matching sentinel
    idx = starts[:, None] + np.arange(TL)[None, :]
    inb = (idx >= 0) & (idx < codes.shape[0])
    t = np.where(inb, codes[np.clip(idx, 0, codes.shape[0] - 1)], 255)

    ar = np.arange(TL + 1, dtype=np.int32)
    prev = np.broadcast_to(ar, (N, TL + 1)).copy()  # D[0][c] = c
    # ptr op codes: 0 = M (diag), 1 = I (up), 2 = D (left)
    ptr = np.empty((N, L, TL), np.int8)
    for r in range(1, L + 1):
        sub = (reads[:, r - 1, None] != t).astype(np.int32)
        diag = prev[:, :-1] + sub
        up = prev[:, 1:] + 1
        cand = np.minimum(diag, up)
        # cur[c] = min(cand[c-1], cur[c-1] + 1) with cur[0] = r, via the
        # running-min identity v = cummin(c - ar) + ar
        c0 = np.concatenate(
            [np.full((N, 1), r, np.int32), cand], axis=1
        )
        cur = np.minimum.accumulate(c0 - ar, axis=1) + ar
        body = cur[:, 1:]
        # deterministic tie-break: M first, then I, then D
        p = np.where(body == up, np.int8(1), np.int8(2))
        p = np.where(body == diag, np.int8(0), p)
        ptr[:, r - 1] = p
        prev = cur

    end_c = np.argmin(prev, axis=1).astype(np.int32)  # leftmost optimum
    nm = prev[np.arange(N), end_c].astype(np.int32)

    cigars = []
    for i in range(N):
        ops = []
        r, c = L, int(end_c[i])
        while r > 0:
            if c == 0:
                ops.append(1)  # only insertions remain
                r -= 1
                continue
            op = ptr[i, r - 1, c - 1]
            ops.append(op)
            if op == 0:
                r -= 1
                c -= 1
            elif op == 1:
                r -= 1
            else:
                c -= 1
        if c > 0:
            # leading deletions: the optimal path enters the read at ref
            # column c, so c reference bases precede the first read base
            ops.extend([2] * c)
        ops.reverse()
        parts = []
        for op in ops:
            sym = "MID"[op]
            if parts and parts[-1][1] == sym:
                parts[-1][0] += 1
            else:
                parts.append([1, sym])
        cigars.append("".join(f"{n}{s}" for n, s in parts))
    return cigars, nm, end_c

"""Host re-alignment (utils/align.edit_alignments) — differential tests.

Ground truth is a scalar start-anchored free-end Levenshtein DP; every
returned CIGAR must also be self-consistent: read-consumed length == L,
ref-consumed length == ref_span, and the NM recomputed by REPLAYING the
CIGAR against the reference equals the returned NM (this is the check
that caught the dropped-leading-deletion traceback bug)."""

import numpy as np

from tpufm.utils.align import edit_alignments


def _scalar_dp(read, text):
    """min over e of edit(read, text[:e]) — start-anchored free end."""
    L, n = len(read), len(text)
    prev = np.arange(n + 1)
    best = prev[0] + L  # empty-text alignment costs L
    for r in range(1, L + 1):
        cur = np.empty(n + 1, np.int64)
        cur[0] = r
        for c in range(1, n + 1):
            cur[c] = min(
                prev[c - 1] + (read[r - 1] != text[c - 1]),
                prev[c] + 1,
                cur[c - 1] + 1,
            )
        prev = cur
    return int(prev.min())


def _replay(cigar, read, window):
    """Walk the CIGAR over (read, ref window): returns (read consumed,
    ref consumed, NM = mismatching M bases + I + D lengths)."""
    import re

    r = c = nm = 0
    for num, sym in re.findall(r"(\d+)([MID])", cigar):
        num = int(num)
        if sym == "M":
            nm += int((read[r : r + num] != window[c : c + num]).sum())
            r += num
            c += num
        elif sym == "I":
            r += num
            nm += num
        else:
            c += num
            nm += num
    return r, c, nm


def test_edit_alignments_leading_deletion_regression(rng):
    """A site whose optimal path begins with a deletion must keep the
    leading D op (previously dropped, leaving CIGAR/NM inconsistent)."""
    codes = rng.integers(0, 4, size=200, dtype=np.uint8)
    L, s = 12, 50
    read = codes[s + 1 : s + 1 + L].copy()  # exact one base later
    # ensure it does NOT match at s with <= 1 substitutions (else the DP
    # may prefer a pure-M path)
    cigars, nm, span = edit_alignments(codes, read[None], [s], 1)
    rd, rf, nm2 = _replay(cigars[0], read, codes[s : s + L + 1])
    assert rd == L and rf == span[0] and nm2 == nm[0]


def test_edit_alignments_differential(rng):
    """Random reads (exact, mutated, shifted, garbage) against random
    starts: NM matches the scalar DP and every CIGAR replays exactly."""
    codes = rng.integers(0, 4, size=500, dtype=np.uint8)
    L, E = 14, 2
    reads, starts = [], []
    for t in range(60):
        s = int(rng.integers(E, 400))
        kind = t % 4
        if kind == 0:
            r = codes[s : s + L].copy()
        elif kind == 1:
            w = list(codes[s : s + L + E])
            for _ in range(E):
                op = rng.integers(0, 3)
                p = int(rng.integers(0, len(w) - 1))
                if op == 0:
                    w[p] = (w[p] + 1) & 3
                elif op == 1:
                    del w[p]
                else:
                    w.insert(p, int(rng.integers(0, 4)))
            r = np.array(w[:L], np.uint8)
        elif kind == 2:
            r = codes[s + 1 : s + 1 + L].copy()  # shifted: leading indel
        else:
            r = rng.integers(0, 4, size=L, dtype=np.uint8)
        reads.append(r)
        starts.append(s)
    reads = np.stack(reads)
    starts = np.asarray(starts)
    cigars, nm, span = edit_alignments(codes, reads, starts, E)
    for i in range(len(starts)):
        want = _scalar_dp(reads[i], codes[starts[i] : starts[i] + L + E])
        assert nm[i] == want, (i, nm[i], want)
        rd, rf, nm2 = _replay(
            cigars[i], reads[i], codes[starts[i] : starts[i] + L + E]
        )
        assert rd == len(reads[i]), (i, cigars[i])
        assert rf == span[i], (i, cigars[i], rf, span[i])
        assert nm2 == nm[i], (i, cigars[i], nm2, nm[i])

"""SA-interval results text format, diff-compatible with the reference
(.res.cpu / .res.gpu files): first line the query count, then one "L R" pair
per line (reference common/common.c:201-246)."""

from __future__ import annotations

import numpy as np


def write_results(path, intervals: np.ndarray) -> None:
    """intervals: uint32 [n, 2]."""
    intervals = np.asarray(intervals)
    with open(path, "w") as fp:
        fp.write(f"{intervals.shape[0]}\n")
        for lo, hi in intervals:
            fp.write(f"{int(lo)} {int(hi)}\n")


def load_results(path) -> np.ndarray:
    with open(path) as fp:
        n = int(fp.readline())
        out = np.empty((n, 2), dtype=np.uint32)
        for i in range(n):
            lo, hi = fp.readline().split()
            out[i, 0] = int(lo)
            out[i, 1] = int(hi)
    return out

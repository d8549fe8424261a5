"""SA-interval results text format, diff-compatible with the reference
(.res.cpu / .res.gpu files): first line the query count, then one "L R" pair
per line (reference common/common.c:201-246)."""

from __future__ import annotations

import numpy as np


def write_results(path, intervals: np.ndarray) -> None:
    """intervals: uint32 [n, 2]. Byte-identical to reference writeResults."""
    intervals = np.asarray(intervals)
    with open(path, "wb") as fp:
        fp.write(f"{intervals.shape[0]}\n".encode())
        np.savetxt(fp, intervals, fmt="%u %u")


def load_results(path) -> np.ndarray:
    with open(path) as fp:
        n = int(fp.readline())
        out = np.loadtxt(fp, dtype=np.uint32, max_rows=n).reshape(n, 2)
    return out

"""Shared NumPy bit-plane operations used by the host oracle, the index
builder, and the format readers. (The jnp twins live in tpufm/engine/xla.py.)"""

from __future__ import annotations

import numpy as np

_U32 = np.uint32
_FULL = _U32(0xFFFFFFFF)


def boundary_masks(shift: np.ndarray, nb: int) -> np.ndarray:
    """Per-window prefix masks for in-block offset `shift` in [0, d].

    Returns uint32 [..., nb]: window w keeps its top clip(shift - 32w, 0, 32)
    bits — the reference's per-window mask construction
    (src/fmIndexCPUBaseline.c:234-237)."""
    shift = np.asarray(shift, dtype=np.int64)[..., None]
    cov = np.clip(shift - 32 * np.arange(nb, dtype=np.int64), 0, 32)
    safe = np.where(cov > 0, 32 - np.minimum(cov, 32), 0).astype(_U32)
    m = np.left_shift(_FULL, safe)
    return np.where(cov > 0, m, _U32(0)).astype(_U32)


def match_words(bitmaps_rows: np.ndarray, code: np.ndarray, k: int) -> np.ndarray:
    """AND-reduce plane selections: which positions in each 32-base window
    match the fused k-mer `code`.

    bitmaps_rows: uint32 [..., k, 2, nb]; code: uint32 broadcastable [...].
    Returns uint32 [..., nb]. Mirrors reference
    src/fmIndexCPUBaseline.c:239-247."""
    code = np.asarray(code, dtype=_U32)[..., None]
    out = np.broadcast_to(
        _FULL, np.broadcast_shapes(bitmaps_rows.shape[:-3], code.shape[:-1])
        + bitmaps_rows.shape[-1:]
    ).copy()
    for i in range(k):
        b0 = (code >> _U32(2 * i)) & _U32(1)
        b1 = (code >> _U32(2 * i + 1)) & _U32(1)
        p0 = bitmaps_rows[..., i, 0, :]
        p1 = bitmaps_rows[..., i, 1, :]
        sel0 = np.where(b0 != 0, p0, ~p0)
        sel1 = np.where(b1 != 0, p1, ~p1)
        out &= sel0 & sel1
    return out


def popcount_rows(words: np.ndarray) -> np.ndarray:
    """Sum of set bits along the last axis."""
    return np.bitwise_count(words).astype(np.int64).sum(axis=-1)

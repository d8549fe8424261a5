"""Differential fuzzing: random (k, d, n, L) configurations, random texts,
hit + miss queries — naive scan vs oracle vs XLA fused vs XLA split must all
agree. The tpufm formalization of the reference's manual cross-implementation
.res diffing (SURVEY.md section 4)."""

import numpy as np
import pytest

from tpufm.config import IndexConfig
from tpufm.engine.oracle import search_oracle
from tpufm.engine.xla import XLAEngine
from tpufm.index.builder import build_index


def naive_count(text: np.ndarray, pattern: np.ndarray) -> int:
    t = text.tobytes()
    p = pattern.tobytes()
    count = start = 0
    while True:
        i = t.find(p, start)
        if i < 0:
            return count
        count += 1
        start = i + 1


@pytest.mark.parametrize("trial", range(8))
def test_engines_agree_and_count_correctly(trial):
    rng = np.random.default_rng(9000 + trial)
    k = int(rng.integers(1, 5))
    d = int(rng.choice([32, 64, 96, 128]))
    n = int(rng.integers(50, 3000))
    L = k * int(rng.integers(1, 9))

    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=k, d=d), sa_method="doubling")

    n_hit = 12 if n > L else 0
    qs = []
    for _ in range(n_hit):
        s = int(rng.integers(0, n - L + 1))
        qs.append(codes[s : s + L])
    qs.extend(rng.integers(0, 4, size=(8, L), dtype=np.uint8))
    queries = np.stack(qs)

    expect = search_oracle(index, queries)
    np.testing.assert_array_equal(XLAEngine(index).search(queries), expect)
    np.testing.assert_array_equal(
        XLAEngine(index, layout="split").search(queries), expect
    )
    if L % k == 0 and k <= 4:
        m = k  # smallest valid LUT
        np.testing.assert_array_equal(
            XLAEngine(index, lut_m=m).search(queries), expect
        )
    # interval width == true occurrence count
    for q, (lo, hi) in zip(queries, expect):
        assert hi - lo == naive_count(codes, q), (k, d, n, L)


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_any_length_and_mismatch(trial):
    """Random (k, d, n, L) with L NOT constrained to k-multiples: the tail
    path must agree with the k=1 oracle, and count(mismatches=1) with a
    naive Hamming scan."""
    rng = np.random.default_rng(7000 + trial)
    k = int(rng.integers(2, 5))
    d = int(rng.choice([32, 64, 96]))
    n = int(rng.integers(200, 2500))
    L = int(rng.integers(4, 20))

    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=k, d=d), sa_method="doubling")
    tail = build_index(codes, IndexConfig(k=1, d=d), sa_method="doubling")
    eng = XLAEngine(index, tail_index=tail)

    n_hit = 8 if n > L else 0
    starts = rng.integers(0, n - L, size=n_hit)
    qs = np.concatenate(
        [
            np.stack([codes[s : s + L] for s in starts])
            if n_hit
            else np.zeros((0, L), np.uint8),
            rng.integers(0, 4, size=(8, L), dtype=np.uint8),
        ]
    )
    got = eng.search(qs)
    np.testing.assert_array_equal(got, search_oracle(tail, qs))
    widths = got[:, 1].astype(np.int64) - got[:, 0]
    for q, w in zip(qs, widths):
        assert w == naive_count(codes, q)

    wins = np.lib.stride_tricks.sliding_window_view(codes, L)
    want_mm = np.array(
        [((wins != q[None]).sum(1) <= 1).sum() for q in qs], dtype=np.uint32
    )
    np.testing.assert_array_equal(eng.count(qs, mismatches=1), want_mm)

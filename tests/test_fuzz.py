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

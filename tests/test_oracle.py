"""Property tests: oracle engine vs naive sorted-suffix binary search, over
(k, d) sweeps, random and adversarial texts. This formalizes the correctness
story the reference only had via manual .res diffing (SURVEY.md section 4)."""

import numpy as np
import pytest

from tpufm.config import IndexConfig
from tpufm.engine.oracle import search_oracle, fuse_query_kmers
from tpufm.index.builder import build_index
from tpufm.index.layouts import make_alt_counters

from conftest import naive_interval


def random_queries(rng, codes, num, length):
    n = len(codes)
    starts = rng.integers(0, n - length + 1, size=num)
    reads = np.stack([codes[s : s + length] for s in starts])
    # a few random (likely absent) patterns too
    misses = rng.integers(0, 4, size=(max(2, num // 4), length), dtype=np.uint8)
    return np.concatenate([reads, misses])


@pytest.mark.parametrize("k", [1, 2, 3, 4])
@pytest.mark.parametrize("d", [32, 64])
def test_oracle_matches_naive(rng, k, d):
    cfg = IndexConfig(k=k, d=d)
    for n in [37, 100, 257]:
        codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        index = build_index(codes, cfg, sa_method="doubling")
        qlen = 4 * k  # divisible by k
        queries = random_queries(rng, codes, 16, qlen)
        got = search_oracle(index, queries)
        for q, (lo, hi) in zip(queries, got):
            exp = naive_interval(codes, q)
            assert (int(lo), int(hi)) == exp, f"k={k} d={d} n={n} q={q}"


@pytest.mark.parametrize("k", [1, 2])
def test_oracle_small_blocks_with_dollar_everywhere(rng, k):
    # Tiny texts: nearly every block contains a '$'-carrying level, so the
    # dollar corrections (reference src/fmIndexCPUBaseline.c:252-256) are
    # exercised hard.
    cfg = IndexConfig(k=k, d=32)
    for n in range(k, 40):
        codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        index = build_index(codes, cfg, sa_method="doubling")
        qlen = k
        queries = random_queries(rng, codes, 8, qlen) if n >= qlen else None
        if queries is None:
            continue
        got = search_oracle(index, queries)
        for q, (lo, hi) in zip(queries, got):
            assert (int(lo), int(hi)) == naive_interval(codes, q)


@pytest.mark.parametrize("k,d", [(1, 32), (2, 32), (2, 64), (3, 32)])
def test_alt_counters_matches_baseline(rng, k, d):
    cfg = IndexConfig(k=k, d=d)
    for n in [50, 101, 192]:
        codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        index = build_index(codes, cfg, sa_method="doubling")
        ac = make_alt_counters(index)
        queries = random_queries(rng, codes, 16, 4 * k)
        np.testing.assert_array_equal(
            search_oracle(index, queries), search_oracle(ac, queries)
        )


def test_block_boundary_bwtsize_divisible(rng):
    # bwtsize % d == 0: the reference searcher reads out of bounds here; tpufm
    # must stay correct via the sentinel occ row.
    cfg = IndexConfig(k=2, d=32)
    codes = rng.integers(0, 4, size=63, dtype=np.uint8)  # bwtsize = 64 = 2*d
    index = build_index(codes, cfg, sa_method="doubling")
    queries = random_queries(rng, codes, 8, 4)
    for q, (lo, hi) in zip(queries, search_oracle(index, queries)):
        assert (int(lo), int(hi)) == naive_interval(codes, q)
    ac = make_alt_counters(index)
    np.testing.assert_array_equal(
        search_oracle(index, queries), search_oracle(ac, queries)
    )


def test_fuse_query_kmers_layout():
    # One read "ACGT", k=2: rounds are (G,T) then (A,C); level 0 = later char.
    q = np.array([[0, 1, 2, 3]], dtype=np.uint8)
    codes = fuse_query_kmers(q, 2)
    # round 0: j=3 -> level0 = T(3), level1 = G(2): 3 | 2<<2 = 11
    # round 1: j=1 -> level0 = C(1), level1 = A(0): 1
    assert codes.shape == (2, 1)
    assert codes[0, 0] == 11 and codes[1, 0] == 1


def test_one_base_text():
    # 1-base reference: bwtsize=2, one block, dollar corrections everywhere.
    from tpufm.config import IndexConfig
    from tpufm.engine.oracle import search_oracle
    from tpufm.engine.xla import XLAEngine
    from tpufm.index.builder import build_index

    for base in range(4):
        codes = np.array([base], np.uint8)
        index = build_index(codes, IndexConfig(k=1, d=32), sa_method="naive")
        q = np.array([[base], [(base + 1) % 4]], np.uint8)
        got = search_oracle(index, q)
        assert got[0, 1] - got[0, 0] == 1  # the base occurs once
        assert got[1, 1] - got[1, 0] == 0  # the other base does not
        np.testing.assert_array_equal(XLAEngine(index).search(q), got)


def test_query_len_not_divisible_by_k_raises():
    from tpufm.config import IndexConfig
    from tpufm.engine.xla import XLAEngine
    from tpufm.index.builder import build_index

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=300, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=2, d=32), sa_method="doubling")
    eng = XLAEngine(index)
    try:
        eng.search(np.zeros((4, 7), np.uint8))
    except ValueError as e:
        # without a tail index such lengths still raise, pointing at it
        assert "tail_index" in str(e)
    else:
        raise AssertionError("expected ValueError")

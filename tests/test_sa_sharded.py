"""Sharded (mesh) suffix array vs the host paths — 8-device CPU mesh.

The sharded build must be bit-identical to suffix_array_doubling (the SA
of a sentinel-terminated text is unique), including when the text length
is not a multiple of the mesh size, when shards are mostly padding, and
on repetitive texts that force many doubling rounds through the odd-even
merge network.
"""

import numpy as np
import pytest

from tpufm.index.sa_sharded import suffix_array_sharded
from tpufm.index.suffix_array import suffix_array_doubling
from tpufm.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


@pytest.mark.parametrize("n", [1, 2, 7, 79, 80, 81, 1000, 4097])
def test_sharded_matches_host(rng, mesh8, n):
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    np.testing.assert_array_equal(
        suffix_array_sharded(codes, mesh8), suffix_array_doubling(codes)
    )


def test_sharded_repetitive(mesh8):
    # Repeats defeat the 10-symbol initial key: ranks stay duplicated for
    # ceil(log2(n/10)) doubling rounds, exercising shifts with h spanning
    # multiple shards and h % m != 0.
    for pat in [b"\x00", b"\x00\x01", b"\x03\x03\x00", b"\x00\x01\x02\x03"]:
        codes = np.frombuffer(pat * 300, dtype=np.uint8).copy()
        np.testing.assert_array_equal(
            suffix_array_sharded(codes, mesh8), suffix_array_doubling(codes)
        )


def test_sharded_empty_and_alphabet(mesh8):
    np.testing.assert_array_equal(
        suffix_array_sharded(np.zeros(0, dtype=np.uint8), mesh8),
        np.zeros(1, dtype=np.int64),
    )
    with pytest.raises(ValueError, match="symbols"):
        suffix_array_sharded(np.array([7], dtype=np.uint8), mesh8)


@pytest.mark.parametrize("ndev", [1, 2, 3, 5])
def test_sharded_other_mesh_sizes(rng, ndev):
    codes = rng.integers(0, 4, size=513, dtype=np.uint8)
    mesh = make_mesh(ndev)
    np.testing.assert_array_equal(
        suffix_array_sharded(codes, mesh), suffix_array_doubling(codes)
    )


def test_build_index_with_sharded_sa(rng):
    from tpufm.config import IndexConfig
    from tpufm.index.builder import build_index

    codes = rng.integers(0, 4, size=5000, dtype=np.uint8)
    a = build_index(codes, IndexConfig(k=2, d=64), sa_method="sharded")
    b = build_index(codes, IndexConfig(k=2, d=64), sa_method="doubling")
    np.testing.assert_array_equal(a.occ, b.occ)
    np.testing.assert_array_equal(a.bitmaps, b.bitmaps)
    np.testing.assert_array_equal(a.dollar_pos, b.dollar_pos)

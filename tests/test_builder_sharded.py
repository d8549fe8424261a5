"""Sharded (mesh) index build vs the host builder — 8-device CPU mesh.

build_index_sharded must be bit-identical to build_index for every field,
across k/d, non-d-aligned text lengths, repetitive texts, and texts small
enough that some shards are pure padding.
"""

import numpy as np
import pytest

from tpufm.config import IndexConfig
from tpufm.index.builder import build_index
from tpufm.index.builder_sharded import build_index_sharded
from tpufm.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


def _assert_same(a, b):
    assert a.bwtsize == b.bwtsize
    np.testing.assert_array_equal(a.occ, b.occ)
    np.testing.assert_array_equal(a.bitmaps, b.bitmaps)
    np.testing.assert_array_equal(np.asarray(a.dollar_pos, np.uint32),
                                  np.asarray(b.dollar_pos, np.uint32))
    np.testing.assert_array_equal(a.dollar_base, b.dollar_base)


@pytest.mark.parametrize("k,d", [(1, 32), (2, 64), (3, 128), (2, 192)])
def test_sharded_build_matches_host(rng, mesh8, k, d):
    codes = rng.integers(0, 4, size=10_000, dtype=np.uint8)
    cfg = IndexConfig(k=k, d=d)
    _assert_same(build_index_sharded(codes, cfg, mesh8), build_index(codes, cfg))


@pytest.mark.parametrize("n", [5, 63, 64, 257, 4097])
def test_sharded_build_sizes(rng, mesh8, n):
    # tiny texts: most shards are pure padding; n=63 makes bwtsize % d == 0
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    cfg = IndexConfig(k=2, d=64)
    _assert_same(build_index_sharded(codes, cfg, mesh8), build_index(codes, cfg))


def test_sharded_build_repetitive(mesh8):
    codes = np.frombuffer(b"\x00\x01" * 2000, dtype=np.uint8).copy()
    cfg = IndexConfig(k=2, d=64)
    _assert_same(build_index_sharded(codes, cfg, mesh8), build_index(codes, cfg))


def test_sharded_build_searchable(rng, mesh8):
    from tpufm.engine import XLAEngine, search_oracle
    from tpufm.io.genreads import generate_reads

    codes = rng.integers(0, 4, size=20_000, dtype=np.uint8)
    idx = build_index_sharded(codes, IndexConfig(k=3, d=128), mesh8)
    reads = generate_reads(codes, 120, 128, seed=9)
    np.testing.assert_array_equal(
        np.asarray(XLAEngine(idx).search(reads)),
        np.asarray(search_oracle(idx, reads)),
    )


@pytest.mark.parametrize("ndev", [2, 5])
def test_sharded_build_other_mesh_sizes(rng, ndev):
    codes = rng.integers(0, 4, size=3001, dtype=np.uint8)
    cfg = IndexConfig(k=2, d=64)
    _assert_same(
        build_index_sharded(codes, cfg, make_mesh(ndev)), build_index(codes, cfg)
    )


@pytest.mark.parametrize("s,d,ndev", [(8, 32, 8), (16, 64, 8), (32, 128, 3)])
def test_sharded_locate_build_matches_host(rng, s, d, ndev):
    from tpufm.index.builder_sharded import build_locate_sharded
    from tpufm.index.locate import build_locate

    codes = rng.integers(0, 4, size=5000, dtype=np.uint8)
    a = build_locate_sharded(codes, sample_rate=s, d=d, mesh=make_mesh(ndev))
    b = build_locate(codes, sample_rate=s, d=d)
    np.testing.assert_array_equal(a.samples, b.samples)
    np.testing.assert_array_equal(a.mark_words, b.mark_words)
    np.testing.assert_array_equal(a.mark_rank, b.mark_rank)
    np.testing.assert_array_equal(a.lf1.occ, b.lf1.occ)
    np.testing.assert_array_equal(a.lf1.bitmaps, b.lf1.bitmaps)


def test_sharded_locate_build_resolves(rng, mesh8):
    from tpufm.index.builder_sharded import build_locate_sharded
    from tpufm.index.locate import locate_oracle
    from tpufm.index.suffix_array import suffix_array

    codes = rng.integers(0, 4, size=3000, dtype=np.uint8)
    loc = build_locate_sharded(codes, sample_rate=8, d=64, mesh=mesh8)
    sa = suffix_array(codes, method="doubling")
    rows = np.arange(len(codes) + 1, dtype=np.uint32)
    np.testing.assert_array_equal(locate_oracle(loc, rows), sa.astype(np.uint32))


@pytest.mark.parametrize("trial", range(6))
def test_sharded_build_fuzz(trial, mesh8):
    # Random (k, d, n) sharded builds must be bit-identical to the host
    # builder — the sharded analog of tests/test_fuzz.py.
    rng = np.random.default_rng(1000 + trial)
    k = int(rng.integers(1, 4))
    d = int(rng.choice([32, 64, 96, 128]))
    n = int(rng.integers(50, 8000))
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    cfg = IndexConfig(k=k, d=d)
    _assert_same(build_index_sharded(codes, cfg, mesh8), build_index(codes, cfg))


def test_sharded_build_device_resident_to_engine(rng, mesh8):
    # return_host=False: tables stay as global sharded device arrays and
    # feed ShardedIndexEngine directly — results equal oracle; the host
    # path equals it bit-for-bit.
    import jax

    from tpufm.engine.oracle import search_oracle
    from tpufm.parallel import ShardedIndexEngine

    codes = rng.integers(0, 4, size=9000, dtype=np.uint8)
    cfg = IndexConfig(k=2, d=64)
    dev = build_index_sharded(codes, cfg, mesh8, return_host=False)
    assert isinstance(dev.occ, jax.Array) and isinstance(dev.bitmaps, jax.Array)
    host = build_index(codes, cfg)
    E1 = host.occ.shape[0]
    got_occ = np.asarray(jax.device_get(dev.occ))
    got_bm = np.asarray(jax.device_get(dev.bitmaps))
    np.testing.assert_array_equal(got_occ[:E1], host.occ)
    np.testing.assert_array_equal(got_bm[:E1], host.bitmaps)
    assert not got_occ[E1:].any() and not got_bm[E1:].any()  # zero pad rows

    starts = rng.integers(0, 9000 - 24, size=64)
    q = np.stack([codes[i : i + 24] for i in starts])
    got = ShardedIndexEngine(dev, mesh8).search(q)
    np.testing.assert_array_equal(got, search_oracle(host, q))

"""The device builder (tpufm/index/builder_device.py) must be bit-identical
to the host builder — which is itself byte-exact vs the reference
gfmiBaseLine binaries (tests/test_reference_parity.py)."""

import numpy as np
import pytest

from tpufm.config import IndexConfig
from tpufm.index.builder import build_index
from tpufm.index.builder_device import build_index_device


def _assert_same(a, b):
    np.testing.assert_array_equal(a.occ, b.occ)
    np.testing.assert_array_equal(a.bitmaps, b.bitmaps)
    np.testing.assert_array_equal(a.dollar_pos, b.dollar_pos)
    np.testing.assert_array_equal(a.dollar_base, b.dollar_base)
    assert a.bwtsize == b.bwtsize


@pytest.mark.parametrize("k,d", [(1, 32), (2, 64), (3, 32), (4, 32), (3, 128)])
def test_device_builder_matches_host(rng, k, d):
    codes = rng.integers(0, 4, size=3001, dtype=np.uint8)
    _assert_same(
        build_index(codes, IndexConfig(k=k, d=d)),
        build_index_device(codes, IndexConfig(k=k, d=d)),
    )


def test_device_builder_edges(rng):
    # bwtsize % d == 0 (no tail padding), tiny texts, repetitive texts.
    cfg = IndexConfig(k=2, d=32)
    for codes in [
        rng.integers(0, 4, size=63, dtype=np.uint8),   # bwtsize == 2*d
        rng.integers(0, 4, size=5, dtype=np.uint8),
        np.zeros(200, dtype=np.uint8),                 # all-'A' repeats
        np.frombuffer(b"\x00\x01\x02\x03" * 100, np.uint8).copy(),
    ]:
        _assert_same(build_index(codes, cfg), build_index_device(codes, cfg))


def test_device_builder_feeds_engine(rng):
    # return_host=False: tables stay on device and drive an engine directly.
    from tpufm.engine.oracle import search_oracle
    from tpufm.engine.xla import XLAEngine
    from tpufm.io.genreads import generate_reads

    codes = rng.integers(0, 4, size=20000, dtype=np.uint8)
    host_index = build_index(codes, IndexConfig(k=2, d=64))
    dev_index = build_index_device(
        codes, IndexConfig(k=2, d=64), return_host=False
    )
    queries = generate_reads(codes, 24, 64, seed=7)
    np.testing.assert_array_equal(
        XLAEngine(dev_index).search(queries), search_oracle(host_index, queries)
    )


def test_device_builder_fuzz(rng):
    # Random (k, d, n) configs, mixed random/repetitive texts — device and
    # host builders must agree bit-for-bit everywhere.
    for _ in range(5):
        k = int(rng.integers(1, 5))
        d = int(rng.integers(1, 5)) * 32
        n = int(rng.integers(50, 4000))
        if rng.random() < 0.3:
            pat = rng.integers(0, 4, size=int(rng.integers(1, 6)), dtype=np.uint8)
            codes = np.tile(pat, -(-n // len(pat)))[:n].copy()
        else:
            codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        cfg = IndexConfig(k=k, d=d)
        _assert_same(build_index(codes, cfg), build_index_device(codes, cfg))


def test_device_locate_builder_matches_host(rng):
    from tpufm.index.builder_device import build_locate_device
    from tpufm.index.locate import build_locate

    for n, s, d in [(3001, 8, 32), (2048, 16, 64), (513, 4, 32)]:
        codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        host = build_locate(codes, sample_rate=s, d=d)
        dev = build_locate_device(codes, sample_rate=s, d=d)
        np.testing.assert_array_equal(dev.samples, host.samples)
        np.testing.assert_array_equal(dev.mark_words, host.mark_words)
        np.testing.assert_array_equal(dev.mark_rank, host.mark_rank)
        _assert_same(dev.lf1, host.lf1)

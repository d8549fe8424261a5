"""Pallas round-kernel correctness in interpreter mode (CPU backend):
bit-exact vs the oracle across (k, d)."""

import numpy as np
import pytest

from tpufm.config import IndexConfig
from tpufm.engine.oracle import search_oracle
from tpufm.engine.pallas_kernel import PallasEngine
from tpufm.index.builder import build_index


@pytest.mark.parametrize("k,d", [(1, 32), (2, 64), (3, 64)])
def test_pallas_engine_matches_oracle(rng, k, d):
    codes = rng.integers(0, 4, size=2000, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=k, d=d), sa_method="doubling")
    engine = PallasEngine(index, tile=64, interpret=True)
    qlen = 12 * k
    starts = rng.integers(0, len(codes) - qlen, size=24)
    queries = np.stack([codes[s : s + qlen] for s in starts])
    queries = np.concatenate(
        [queries, rng.integers(0, 4, size=(8, qlen), dtype=np.uint8)]
    )  # 32 reads -> 64 ends, multiple of tile
    np.testing.assert_array_equal(
        engine.search(queries), search_oracle(index, queries)
    )


def test_pallas_engine_any_batch_size(rng):
    # batches that are not tile multiples (and smaller than one tile) are
    # padded inside the round kernel — a floor grid would silently return
    # garbage for the tail / the whole batch.
    from tpufm.engine.oracle import search_oracle

    codes = rng.integers(0, 4, size=500, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=2, d=64), sa_method="doubling")
    engine = PallasEngine(index, tile=64, interpret=True)
    for n in (1, 30, 33):
        starts = rng.integers(0, len(codes) - 8, size=n)
        queries = np.stack([codes[s : s + 8] for s in starts])
        np.testing.assert_array_equal(
            engine.search(queries), search_oracle(index, queries)
        )


def test_pallas_engine_with_lut(rng):
    codes = rng.integers(0, 4, size=1500, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=2, d=32), sa_method="doubling")
    engine = PallasEngine(index, tile=64, interpret=True, lut_m=4)
    qlen = 4 + 10 * 2
    starts = rng.integers(0, len(codes) - qlen, size=32)
    queries = np.stack([codes[s : s + qlen] for s in starts])
    np.testing.assert_array_equal(
        engine.search(queries), search_oracle(index, queries)
    )


def test_pallas_wave_streaming(rng):
    from tpufm.config import IndexConfig
    from tpufm.engine.oracle import search_oracle
    from tpufm.engine.pallas_kernel import PallasEngine
    from tpufm.index.builder import build_index

    codes = rng.integers(0, 4, size=6000, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=2, d=32))
    starts = rng.integers(0, 5900, size=100)
    queries = np.stack([codes[s : s + 24] for s in starts])
    eng = PallasEngine(index, tile=256)
    np.testing.assert_array_equal(
        eng.search(queries, wave=32), search_oracle(index, queries)
    )

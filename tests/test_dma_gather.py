"""The Pallas DMA gather primitive (tpufm/engine/dma_gather.py) and the
XLAEngine(gather="dma") path must be bit-exact vs the XLA gather / oracle.

Runs in Pallas interpret mode on the CPU test backend; the same kernel
compiles for TPU (measured numbers in docs/PERF.md 'Owning the gather')."""

import numpy as np
import pytest

from tpufm.config import IndexConfig
from tpufm.engine.oracle import search_oracle
from tpufm.engine.xla import XLAEngine
from tpufm.index.builder import build_index
from tpufm.io.genreads import generate_reads


def test_dma_gather_matches_take(rng):
    import jax.numpy as jnp

    from tpufm.engine.dma_gather import make_dma_gather

    E, W = 500, 128
    table = jnp.asarray(rng.integers(0, 2**32, (E, W), dtype=np.uint32))
    # non-multiple-of-CHUNK N exercises the pad/drop path
    idx = jnp.asarray(rng.integers(0, E, 1500, dtype=np.int32))
    gather = make_dma_gather(E, W, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(gather(table, idx)), np.asarray(jnp.take(table, idx, axis=0))
    )


def test_dma_gather_rejects_unpadded_rows():
    from tpufm.engine.dma_gather import make_dma_gather

    with pytest.raises(ValueError, match="multiple of 128"):
        make_dma_gather(100, 88)


def test_engine_dma_gather_bit_exact(rng):
    codes = rng.integers(0, 4, size=20000, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=2, d=64))
    reads = generate_reads(codes, 24, 64, seed=5)
    misses = rng.integers(0, 4, size=(32, 24), dtype=np.uint8)
    queries = np.concatenate([reads, misses])
    expect = search_oracle(index, queries)
    eng = XLAEngine(index, gather="dma")
    np.testing.assert_array_equal(eng.search(queries), expect)
    # and with the prefix LUT in front
    eng_lut = XLAEngine(index, gather="dma", lut_m=4)
    np.testing.assert_array_equal(eng_lut.search(queries), expect)

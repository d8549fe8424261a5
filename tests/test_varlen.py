"""Variable-length batch search: one program, per-read masked rounds.

The reference's engines (and tpufm's fixed-length paths) take a dense
[B, L] batch — every read the same length. Real FASTQ runs mix lengths
(adapter trimming), so XLAEngine.search_varlen accepts a RIGHT-ALIGNED
0xFF-padded batch and searches each read at its own true length in one
fixed program (engine/xla.py make_search_varlen_fn). Ground truth here is
the per-read fixed-length oracle (engine/oracle.py search_oracle with the
k=1 tail), run once per distinct length.
"""

import numpy as np
import pytest

from tpufm.config import IndexConfig
from tpufm.engine.oracle import search_oracle
from tpufm.engine.xla import VARLEN_PAD, XLAEngine
from tpufm.index.builder import build_index, derive_tail


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(42)
    codes = rng.integers(0, 4, size=50_000, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=3, d=64))
    tail = derive_tail(index)
    return codes, index, tail


def _mixed_batch(codes, rng, lengths):
    """Right-aligned 0xFF-padded batch: half sampled from the text (hits),
    half uniform random (mostly misses), lengths cycling through
    `lengths`."""
    lmax = max(lengths)
    rows = []
    true = []
    for i, L in enumerate(lengths):
        if i % 2 == 0:
            s = int(rng.integers(0, len(codes) - L))
            read = codes[s : s + L]
        else:
            read = rng.integers(0, 4, size=L, dtype=np.uint8)
        true.append(read)
        row = np.full(lmax, VARLEN_PAD, dtype=np.uint8)
        row[lmax - L :] = read
        rows.append(row)
    return np.stack(rows), true


def _oracle_per_read(index, tail, true_reads):
    return np.stack(
        [
            search_oracle(index, r[None, :], tail_index=tail)[0]
            for r in true_reads
        ]
    )


def test_varlen_matches_per_read_oracle(setup, rng):
    codes, index, tail = setup
    lengths = [15, 16, 17, 18, 30, 31, 45, 44, 29, 15, 33, 46]
    batch, true = _mixed_batch(codes, rng, lengths)
    got = XLAEngine(index, tail_index=tail).search_varlen(batch)
    want = _oracle_per_read(index, tail, true)
    np.testing.assert_array_equal(got, want)


def test_varlen_with_lut(setup, rng):
    codes, index, tail = setup
    lengths = [12, 13, 14, 20, 27, 12, 35, 40]  # min == lut_m exactly
    batch, true = _mixed_batch(codes, rng, lengths)
    got = XLAEngine(index, tail_index=tail, lut_m=12).search_varlen(batch)
    want = _oracle_per_read(index, tail, true)
    np.testing.assert_array_equal(got, want)


def test_varlen_uniform_equals_fixed(setup, rng):
    # a varlen batch that happens to be uniform must equal the fixed path
    codes, index, tail = setup
    eng = XLAEngine(index, tail_index=tail)
    reads = rng.integers(0, 4, size=(32, 24), dtype=np.uint8)
    np.testing.assert_array_equal(eng.search_varlen(reads), eng.search(reads))


@pytest.mark.parametrize("k", [1, 2])
def test_varlen_small_k(setup, rng, k):
    codes, _, _ = setup
    index = build_index(codes, IndexConfig(k=k, d=32))
    tail = None if k == 1 else derive_tail(index)
    lengths = [7, 9, 10, 23, 8, 31]
    batch, true = _mixed_batch(codes, rng, lengths)
    got = XLAEngine(index, tail_index=tail).search_varlen(batch)
    want = _oracle_per_read(index, tail if k > 1 else None, true)
    np.testing.assert_array_equal(got, want)


def test_varlen_waves(setup, rng):
    # wave streaming: tail wave is zero-padded; results must be identical
    codes, index, tail = setup
    lengths = [15 + int(x) for x in rng.integers(0, 30, size=100)]
    batch, true = _mixed_batch(codes, rng, lengths)
    eng = XLAEngine(index, tail_index=tail)
    got = eng.search_varlen(batch, wave=32)
    np.testing.assert_array_equal(got, eng.search_varlen(batch))


def test_varlen_validation(setup, rng):
    codes, index, tail = setup
    batch = np.full((4, 20), VARLEN_PAD, dtype=np.uint8)
    batch[:, 10:] = rng.integers(0, 4, size=(4, 10), dtype=np.uint8)
    with pytest.raises(ValueError, match="tail_index"):
        XLAEngine(index).search_varlen(batch)
    with pytest.raises(ValueError, match="lut_m"):
        XLAEngine(index, tail_index=tail, lut_m=12).search_varlen(batch)
    empty = np.full((1, 8), VARLEN_PAD, dtype=np.uint8)
    with pytest.raises(ValueError, match="empty read"):
        XLAEngine(index, tail_index=tail).search_varlen(empty)


def test_load_queries_varlen(tmp_path, setup, rng):
    from tpufm.io.fasta import load_queries_varlen
    from tpufm.utils.encoding import decode_bases

    codes, index, tail = setup
    lengths = [18, 25, 40, 19, 33]
    reads = [rng.integers(0, 4, size=L, dtype=np.uint8) for L in lengths]
    reads[1] = codes[100 : 100 + 25]  # one guaranteed hit
    path = tmp_path / "mixed.fa"
    with open(path, "w") as fp:
        for i, r in enumerate(reads):
            fp.write(f">r{i}\n{decode_bases(r).decode()}\n")
    batch = load_queries_varlen(path)
    assert batch.shape == (5, 40)
    assert (batch[0, :22] == VARLEN_PAD).all()
    np.testing.assert_array_equal(batch[0, 22:], reads[0])
    got = XLAEngine(index, tail_index=tail).search_varlen(batch)
    want = _oracle_per_read(index, tail, reads)
    np.testing.assert_array_equal(got, want)
    hit = got[1]
    assert hit[1] > hit[0]


def test_varlen_mesh_matches_single_chip(setup, rng):
    """DataParallelEngine.search_varlen over the 8-device virtual mesh is
    bit-identical to the single-chip result, including a batch not
    divisible by the mesh size (pad_cycle tail)."""
    from tpufm.parallel import DataParallelEngine, make_mesh

    codes, index, tail = setup
    lengths = [15 + int(x) for x in rng.integers(0, 30, size=43)]  # 43 % 8 != 0
    batch, _ = _mixed_batch(codes, rng, lengths)
    single = XLAEngine(index, tail_index=tail, lut_m=6).search_varlen(batch)
    mesh = make_mesh()
    got = DataParallelEngine(
        index, mesh, tail_index=tail, lut_m=6
    ).search_varlen(batch)
    np.testing.assert_array_equal(got, single)

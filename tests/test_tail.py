"""Any-query-length support (k=1 tail index): bit-exact vs the k=1 oracle.

The reference's round loop assumes L % k == 0 (src/fmIndexCPUBaseline.c:
200-228) and its fixed-k builds reject other lengths — real 151 bp reads
cannot run at k=3 there. tpufm finishes the r = L mod k leftover leading
characters with single-step rounds on an auxiliary k=1 fused table
(tpufm.engine.xla._tail_scan). Ground truth: a pure k=1 backward search
reaches the same SA interval for ANY length, so search_oracle on the tail
index itself is the oracle here.
"""

import numpy as np
import pytest

from tpufm.config import IndexConfig
from tpufm.engine.oracle import search_oracle
from tpufm.engine.xla import XLAEngine
from tpufm.index.builder import build_index


def _mk(rng, k, d, n, tail_d=None):
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=k, d=d), sa_method="doubling")
    tail = build_index(
        codes, IndexConfig(k=1, d=tail_d or d), sa_method="doubling"
    )
    return codes, index, tail


def _queries(rng, codes, qlen, hits=48, misses=16):
    starts = rng.integers(0, len(codes) - qlen, size=hits)
    qs = np.stack([codes[s : s + qlen] for s in starts])
    return np.concatenate(
        [qs, rng.integers(0, 4, size=(misses, qlen), dtype=np.uint8)]
    )


@pytest.mark.parametrize("k,d,qlen", [(3, 64, 13), (3, 64, 14), (2, 32, 11),
                                      (4, 32, 18), (3, 32, 151)])
def test_tail_matches_k1_oracle(rng, k, d, qlen):
    codes, index, tail = _mk(rng, k, d, 2000)
    engine = XLAEngine(index, tail_index=tail)
    queries = _queries(rng, codes, qlen)
    got = engine.search(queries)
    np.testing.assert_array_equal(got, search_oracle(tail, queries))
    assert (got[:48, 1] > got[:48, 0]).all()  # sampled reads must occur


def test_tail_with_different_d(rng):
    # the tail index may use its own sample distance
    codes, index, tail = _mk(rng, 3, 64, 1500, tail_d=128)
    queries = _queries(rng, codes, 17)
    got = XLAEngine(index, tail_index=tail).search(queries)
    np.testing.assert_array_equal(got, search_oracle(tail, queries))


def test_tail_with_lut(rng):
    # r = (L - lut_m) % k == L % k since lut_m % k == 0
    codes, index, tail = _mk(rng, 3, 32, 1200)
    queries = _queries(rng, codes, 31)  # (31 - 6) % 3 == 1
    got = XLAEngine(index, tail_index=tail, lut_m=6).search(queries)
    np.testing.assert_array_equal(got, search_oracle(tail, queries))


def test_tail_paired_layout(rng):
    codes, index, tail = _mk(rng, 3, 32, 1200)
    eng = XLAEngine(index, layout="paired", lut_m=6, tail_index=tail)
    queries = _queries(rng, codes, 32)  # (32 - 6) % 3 == 2
    np.testing.assert_array_equal(
        eng.search(queries), search_oracle(tail, queries)
    )


def test_oracle_tail_param(rng):
    codes, index, tail = _mk(rng, 3, 64, 800)
    queries = _queries(rng, codes, 13, hits=24, misses=8)
    np.testing.assert_array_equal(
        search_oracle(index, queries, tail_index=tail),
        search_oracle(tail, queries),
    )


def test_exact_multiple_ignores_tail(rng):
    # L % k == 0 must not touch the tail path at all
    codes, index, tail = _mk(rng, 3, 64, 900)
    queries = _queries(rng, codes, 12, hits=24, misses=8)
    np.testing.assert_array_equal(
        XLAEngine(index, tail_index=tail).search(queries),
        XLAEngine(index).search(queries),
    )


def test_no_tail_raises(rng):
    codes, index, _ = _mk(rng, 3, 64, 600)
    engine = XLAEngine(index)
    with pytest.raises(ValueError, match="tail_index"):
        engine.search(rng.integers(0, 4, size=(8, 13), dtype=np.uint8))
    with pytest.raises(ValueError, match="tail_index"):
        search_oracle(index, rng.integers(0, 4, size=(8, 13), dtype=np.uint8))


def test_tail_validation(rng):
    codes, index, tail = _mk(rng, 3, 64, 600)
    with pytest.raises(ValueError, match="k=1"):
        XLAEngine(index, tail_index=index)  # k=3 is not a tail index
    other = build_index(
        rng.integers(0, 4, size=500, dtype=np.uint8),
        IndexConfig(k=1, d=64),
        sa_method="doubling",
    )
    with pytest.raises(ValueError, match="bwtsize"):
        XLAEngine(index, tail_index=other)  # different text


def test_tail_data_parallel(rng):
    import jax

    from tpufm.parallel import DataParallelEngine, make_mesh

    codes, index, tail = _mk(rng, 3, 64, 1500)
    mesh = make_mesh(len(jax.devices()))
    eng = DataParallelEngine(index, mesh, tail_index=tail)
    queries = _queries(rng, codes, 13, hits=40, misses=24)
    np.testing.assert_array_equal(
        eng.search(queries), search_oracle(tail, queries)
    )


def test_tail_fused_locate(rng):
    """SearchLocateEngine accepts any length at ZERO table cost: the locate
    walk's k=1 LF rows double as the tail table."""
    from tpufm.engine.xla import SearchLocateEngine
    from tpufm.index.locate import build_locate, locate_oracle
    from tpufm.index.suffix_array import suffix_array

    codes = rng.integers(0, 4, size=1500, dtype=np.uint8)
    sa = suffix_array(codes, method="doubling")
    index = build_index(codes, IndexConfig(k=3, d=64), sa=sa)
    loc = build_locate(codes, sample_rate=8, d=64, sa=sa)
    tail = build_index(codes, IndexConfig(k=1, d=64), sa=sa)

    queries = _queries(rng, codes, 17, hits=24, misses=8)
    iv, pos = SearchLocateEngine(index, loc, max_hits=4).search_locate(queries)
    want_iv = search_oracle(tail, queries)
    np.testing.assert_array_equal(iv, want_iv)
    # positions agree with the oracle walk on the first hit of each read
    for i in range(24):
        lo, hi = int(want_iv[i, 0]), int(want_iv[i, 1])
        want = sorted(locate_oracle(loc, np.arange(lo, min(hi, lo + 4), dtype=np.uint32)))
        got = sorted(int(x) for x in pos[i] if x != 0xFFFFFFFF)
        assert got == sorted(int(w) for w in want)


def test_tail_fused_locate_mesh(rng):
    import jax

    from tpufm.engine.xla import SearchLocateEngine
    from tpufm.index.locate import build_locate
    from tpufm.index.suffix_array import suffix_array
    from tpufm.parallel import make_mesh
    from tpufm.parallel.locate import DataParallelSearchLocate

    codes = rng.integers(0, 4, size=1200, dtype=np.uint8)
    sa = suffix_array(codes, method="doubling")
    index = build_index(codes, IndexConfig(k=3, d=64), sa=sa)
    loc = build_locate(codes, sample_rate=8, d=64, sa=sa)
    queries = _queries(rng, codes, 16, hits=24, misses=8)  # 16 % 3 == 1

    iv1, pos1 = SearchLocateEngine(index, loc, max_hits=4).search_locate(queries)
    mesh = make_mesh(len(jax.devices()))
    iv2, pos2 = DataParallelSearchLocate(
        index, loc, mesh, max_hits=4
    ).search_locate(queries)
    np.testing.assert_array_equal(iv1, iv2)
    np.testing.assert_array_equal(pos1, pos2)


def test_tail_search_device_waved(rng):
    # the device-resident waved path honors the tail like .search does
    import jax.numpy as jnp

    codes, index, tail = _mk(rng, 3, 64, 1200)
    eng = XLAEngine(index, tail_index=tail)
    queries = _queries(rng, codes, 13, hits=24, misses=8)
    got = np.asarray(
        eng.search_device_waved(jnp.asarray(queries), wave=16)
    )
    np.testing.assert_array_equal(got, search_oracle(tail, queries))


def test_cli_odd_length_alt_counters_exits(tmp_path, rng, monkeypatch):
    from tpufm import cli
    from tpufm.io.fasta import write_reference
    from tpufm.utils.encoding import decode_bases

    monkeypatch.chdir(tmp_path)
    codes = rng.integers(0, 4, size=2000, dtype=np.uint8)
    write_reference("ref.fa", decode_bases(codes))
    cli.main(["build", "ref.fa", "2000", "--k", "2", "--d", "64", "--tail"])
    fmi = "ref.fa.2000.64fmi2steps.fmi"
    cli.main(["transform", fmi])
    cli.main(["genreads", "ref.fa", "2000", "13", "8", "--output", "o.qry"])
    with pytest.raises(SystemExit, match="alt-counters"):
        cli.main(["search", fmi + ".ac", "o.qry", "13", "8",
                  "--engine", "xla-ac"])


def test_cli_build_tail_on_device(tmp_path, rng, monkeypatch):
    """--tail on the device and sharded build paths: one shared suffix sort,
    tail byte-identical to a host-built k=1 index; k=1 builds reuse the main
    index as the tail outright."""
    from tpufm import cli
    from tpufm.index.formats import load_npz
    from tpufm.io.fasta import write_reference
    from tpufm.utils.encoding import decode_bases

    monkeypatch.chdir(tmp_path)
    codes = rng.integers(0, 4, size=3000, dtype=np.uint8)
    write_reference("ref.fa", decode_bases(codes))
    host_tail = build_index(codes, IndexConfig(k=1, d=64), sa_method="doubling")

    for extra, outn in ((["--on-device"], "dev.npz"),
                        (["--on-device", "--mesh", "8"], "mesh.npz")):
        cli.main(["build", "ref.fa", "3000", "--k", "2", "--d", "64",
                  "--tail", *extra, "--output", outn])
        t = load_npz(f"{outn}.tail.npz")
        assert t.config.k == 1
        np.testing.assert_array_equal(t.occ, host_tail.occ)
        np.testing.assert_array_equal(t.bitmaps, host_tail.bitmaps)

    cli.main(["build", "ref.fa", "3000", "--k", "1", "--d", "64",
              "--tail", "--output", "k1.npz"])
    t = load_npz("k1.npz.tail.npz")
    np.testing.assert_array_equal(t.occ, host_tail.occ)


@pytest.mark.parametrize("k,d,n", [(2, 32, 777), (3, 64, 2000), (4, 32, 500),
                                   (3, 128, 1500)])
def test_derive_tail_byte_identical(rng, k, d, n):
    """derive_tail reconstructs the k=1 index from the k-step tables alone —
    byte-identical to building k=1 from the text (no text/SA needed)."""
    from tpufm.index.builder import derive_tail

    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=k, d=d), sa_method="doubling")
    want = build_index(codes, IndexConfig(k=1, d=d), sa_method="doubling")
    got = derive_tail(index)
    assert got.config.k == 1 and got.bwtsize == want.bwtsize
    np.testing.assert_array_equal(got.occ, want.occ)
    np.testing.assert_array_equal(got.bitmaps, want.bitmaps)
    np.testing.assert_array_equal(got.dollar_pos, want.dollar_pos)
    np.testing.assert_array_equal(got.dollar_base, want.dollar_base)
    # and it actually searches: odd lengths vs the k=1 oracle
    queries = _queries(rng, codes, 2 * k + 1, hits=16, misses=8)
    np.testing.assert_array_equal(
        XLAEngine(index, tail_index=got).search(queries),
        search_oracle(want, queries),
    )


def test_derive_tail_k1_identity(rng):
    from tpufm.index.builder import derive_tail

    codes = rng.integers(0, 4, size=400, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=1, d=32), sa_method="doubling")
    assert derive_tail(index) is index


@pytest.mark.parametrize("routing", ["allgather", "ring", "a2a"])
def test_tail_sharded_index(rng, routing):
    """Sharded engine: main table sharded, k=1 tail REPLICATED — odd-length
    batches match the k=1 oracle on every routing."""
    import jax

    from tpufm.parallel import ShardedIndexEngine, make_mesh

    codes, index, tail = _mk(rng, 3, 64, 1500)
    mesh = make_mesh(len(jax.devices()))
    eng = ShardedIndexEngine(index, mesh, routing=routing, tail_index=tail)
    queries = _queries(rng, codes, 13, hits=32, misses=16)
    np.testing.assert_array_equal(
        eng.search(queries), search_oracle(tail, queries)
    )


def test_tail_sharded_with_lut(rng):
    import jax

    from tpufm.parallel import ShardedIndexEngine, make_mesh

    codes, index, tail = _mk(rng, 3, 32, 1200)
    mesh = make_mesh(len(jax.devices()))
    eng = ShardedIndexEngine(index, mesh, lut_m=6, tail_index=tail)
    queries = _queries(rng, codes, 31, hits=32, misses=16)  # (31-6) % 3 == 1
    np.testing.assert_array_equal(
        eng.search(queries), search_oracle(tail, queries)
    )
    # even length through the same tail-equipped program
    q2 = _queries(rng, codes, 30, hits=16, misses=8)
    np.testing.assert_array_equal(eng.search(q2), search_oracle(index, q2))

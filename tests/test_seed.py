"""Pigeonhole seed-and-extend (`--mismatches >= 2`) — tpufm extension.

Ground truth is a naive sliding-window Hamming scan (seed_extend_oracle).
The variant-expansion path (mismatches=1) cross-checks the m=1 case of the
seed engine; repetitive text exercises the seed_hits overflow contract.
"""

import numpy as np
import pytest

from tpufm.config import IndexConfig
from tpufm.engine.seed import (
    SeedExtendEngine,
    hamming_to_text,
    pack_query_words,
    pack_text_words,
    seed_extend_oracle,
)
from tpufm.index.builder import build_index
from tpufm.index.locate import build_locate
from tpufm.index.suffix_array import suffix_array

SENT = np.uint32(0xFFFFFFFF)


def _naive_pack(codes):
    nw = -(-len(codes) // 16) + 1
    out = np.zeros(nw, np.uint32)
    for j, c in enumerate(codes):
        out[j // 16] |= np.uint32(c) << np.uint32(2 * (15 - j % 16))
    return out


def test_pack_text_words_matches_naive(rng):
    codes = rng.integers(0, 4, size=53, dtype=np.uint8)
    np.testing.assert_array_equal(pack_text_words(codes), _naive_pack(codes))


def test_pack_query_words_matches_text_packing(rng):
    qs = rng.integers(0, 4, size=(5, 21), dtype=np.uint8)
    got = np.asarray(pack_query_words(qs))
    for q, row in zip(qs, got):
        np.testing.assert_array_equal(row, _naive_pack(q)[: row.shape[0]])


def test_hamming_to_text_matches_naive(rng):
    import jax.numpy as jnp

    codes = rng.integers(0, 4, size=400, dtype=np.uint8)
    tw = jnp.asarray(pack_text_words(codes))
    L = 37  # odd, partial last word
    pos = rng.integers(0, len(codes) - L + 1, size=64).astype(np.uint32)
    qs = rng.integers(0, 4, size=(64, L), dtype=np.uint8)
    got = np.asarray(
        hamming_to_text(tw, jnp.asarray(pos), pack_query_words(jnp.asarray(qs)), L)
    )
    want = np.array(
        [(codes[p : p + L] != q).sum() for p, q in zip(pos, qs)]
    )
    np.testing.assert_array_equal(got, want)


def _setup(rng, n=3000, k=3, d=64, s=8):
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    sa = suffix_array(codes, method="doubling")
    index = build_index(codes, IndexConfig(k=k, d=d), sa=sa)
    loc = build_locate(codes, sample_rate=s, d=d, sa=sa)
    return codes, index, loc


def _reads_with_planted(rng, codes, L, m, n_sampled=24, n_random=8):
    """Reads sampled from the text with exactly j <= m substitutions, plus
    random reads."""
    starts = rng.integers(0, len(codes) - L + 1, size=n_sampled)
    qs = np.stack([codes[s : s + L].copy() for s in starts])
    for i in range(n_sampled):
        nmut = rng.integers(0, m + 1)
        for p in rng.choice(L, size=nmut, replace=False):
            qs[i, p] = (qs[i, p] + rng.integers(1, 4)) & 3
    rand = rng.integers(0, 4, size=(n_random, L), dtype=np.uint8)
    return np.concatenate([qs, rand])


@pytest.mark.parametrize("m,L,k,lut", [(2, 30, 3, 0), (2, 31, 3, 6), (3, 45, 3, 0), (4, 50, 2, 4)])
def test_seed_extend_matches_naive(rng, m, L, k, lut):
    codes, index, loc = _setup(rng, k=k)
    eng = SeedExtendEngine(
        index, loc, codes, mismatches=m, seed_hits=64, max_hits=8, lut_m=lut
    )
    qs = _reads_with_planted(rng, codes, L, m)
    pos, counts, overflow = eng.locate_approx(qs)
    want_counts, want_pos = seed_extend_oracle(codes, qs, m)
    assert not overflow.any(), "random text should not overflow seed_hits=64"
    np.testing.assert_array_equal(counts, want_counts)
    for got_row, want_row in zip(pos, want_pos):
        keep = got_row != SENT
        np.testing.assert_array_equal(got_row[keep], want_row[: keep.sum()])
        assert keep.sum() == min(len(want_row), 8)


def test_seed_extend_m1_matches_variant_expansion(rng):
    """m=1: the seed path's distinct-position counts must equal the
    variant-expansion occurrence counts (variants are pairwise distinct, so
    both count distinct positions)."""
    from tpufm.engine.xla import XLAEngine

    codes, index, loc = _setup(rng, k=2)
    L = 16
    qs = _reads_with_planted(rng, codes, L, 1, n_sampled=16, n_random=8)
    eng = SeedExtendEngine(index, loc, codes, mismatches=1, seed_hits=128)
    counts, overflow = eng.count_approx(qs)
    assert not overflow.any()
    want = XLAEngine(index).count(qs, mismatches=1)
    np.testing.assert_array_equal(counts, want)


def test_seed_overflow_flagged_on_repeats(rng):
    # a pure repeat: every seed's interval is the whole repeat family
    codes = np.tile(rng.integers(0, 4, size=16, dtype=np.uint8), 100)
    sa = suffix_array(codes, method="doubling")
    index = build_index(codes, IndexConfig(k=2, d=64), sa=sa)
    loc = build_locate(codes, sample_rate=8, d=64, sa=sa)
    eng = SeedExtendEngine(index, loc, codes, mismatches=2, seed_hits=4)
    qs = codes[None, :48].copy()
    pos, counts, overflow = eng.locate_approx(qs)
    assert overflow[0]
    want_counts, _ = seed_extend_oracle(codes, qs, 2)
    # capped path reports a LOWER BOUND, and every reported position is real
    assert 0 < counts[0] <= want_counts[0]
    keep = pos[0] != SENT
    wins = np.lib.stride_tricks.sliding_window_view(codes, 48)
    for p in pos[0][keep]:
        assert (wins[p] != qs[0]).sum() <= 2


def test_seed_extend_too_short_raises(rng):
    codes, index, loc = _setup(rng, k=3)
    eng = SeedExtendEngine(index, loc, codes, mismatches=3)
    with pytest.raises(ValueError, match="too short"):
        eng.locate_approx(rng.integers(0, 4, size=(4, 10), dtype=np.uint8))


def test_seed_extend_empty_batch(rng):
    codes, index, loc = _setup(rng)
    eng = SeedExtendEngine(index, loc, codes, mismatches=2)
    pos, counts, overflow = eng.locate_approx(np.zeros((0, 30), np.uint8))
    assert pos.shape == (0, 4) and counts.shape == (0,) and overflow.shape == (0,)


def test_seed_extend_data_parallel(rng):
    """DataParallelSearchLocate.locate_approx over the virtual mesh ==
    single-chip SeedExtendEngine, including a non-mesh-multiple batch."""
    import jax

    from tpufm.parallel import DataParallelSearchLocate, make_mesh

    codes, index, loc = _setup(rng, n=2500, k=2)
    qs = _reads_with_planted(rng, codes, 30, 2, n_sampled=13, n_random=8)
    sc = SeedExtendEngine(index, loc, codes, mismatches=2, seed_hits=64, max_hits=8)
    dp = DataParallelSearchLocate(
        index, loc, make_mesh(len(jax.devices())), max_hits=8
    )
    got = dp.locate_approx(qs, codes, mismatches=2, seed_hits=64)
    want = sc.locate_approx(qs)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("budget", [1, 512, None, 10**9])
def test_seed_walk_budget_paths_identical(rng, budget):
    """The compacted sampled-SA walk and its full-width lax.cond fallback
    are bit-identical: budget=1 forces the fallback (valid lanes > 1),
    budget=512 the compact path (valid lanes fit, 512 < N lanes), None
    the auto default, 1e9 the no-compaction path."""
    codes, index, loc = _setup(rng, n=2500, k=2)
    qs = _reads_with_planted(rng, codes, 30, 2, n_sampled=20, n_random=8)
    ref = SeedExtendEngine(
        index, loc, codes, mismatches=2, seed_hits=64, max_hits=8,
        walk_budget=10**9,
    ).locate_approx(qs)
    got = SeedExtendEngine(
        index, loc, codes, mismatches=2, seed_hits=64, max_hits=8,
        walk_budget=budget,
    ).locate_approx(qs)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)


def test_seed_verify_budget_paths_identical(rng):
    """Compacted Hamming verify and its full-grid fallback are
    bit-identical across budgets (0 = off, 1 = forced fallback, 512 =
    compact path, None = auto)."""
    codes, index, loc = _setup(rng, n=2500, k=2)
    qs = _reads_with_planted(rng, codes, 30, 2, n_sampled=16, n_random=6)
    outs = [
        SeedExtendEngine(
            index, loc, codes, mismatches=2, seed_hits=64, max_hits=8,
            verify_budget=b,
        ).locate_approx(qs)
        for b in (0, 1, 512, None)
    ]
    for got in outs[1:]:
        for a, b in zip(got, outs[0]):
            np.testing.assert_array_equal(a, b)


def test_edit_walk_budget_paths_identical(rng):
    from tpufm.engine.edit import EditExtendEngine

    codes, index, loc = _setup(rng, n=2500, k=2)
    qs = _reads_with_planted(rng, codes, 30, 2, n_sampled=12, n_random=4)
    outs = [
        EditExtendEngine(
            index, loc, codes, edits=2, seed_hits=64, max_hits=8,
            walk_budget=b,
        ).locate_edits(qs)
        for b in (1, 512, 10**9)
    ]
    for got in outs[1:]:
        for a, b in zip(got, outs[0]):
            np.testing.assert_array_equal(a, b)


def test_seed_extend_mesh_batch_smaller_than_mesh(rng):
    """B < n_devices: the mesh pre-pad must cycle (a plain queries[:pad]
    slice under-fills and crashes put_global)."""
    import jax

    from tpufm.parallel import DataParallelSearchLocate, make_mesh

    codes, index, loc = _setup(rng, n=2000, k=2)
    qs = _reads_with_planted(rng, codes, 30, 2, n_sampled=3, n_random=0)
    sc = SeedExtendEngine(index, loc, codes, mismatches=2, seed_hits=64, max_hits=8)
    dp = DataParallelSearchLocate(
        index, loc, make_mesh(len(jax.devices())), max_hits=8
    )
    got = dp.locate_approx(qs, codes, mismatches=2, seed_hits=64)
    want = sc.locate_approx(qs)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_mesh_text_cache_keyed_by_content(rng):
    """Re-calling locate_approx with a DIFFERENT text (same distance/cap
    key) must re-verify against the new text, not stale cached words."""
    import jax

    from tpufm.parallel import DataParallelSearchLocate, make_mesh

    codes, index, loc = _setup(rng, n=2000, k=2)
    dp = DataParallelSearchLocate(
        index, loc, make_mesh(len(jax.devices())), max_hits=8
    )
    qs = _reads_with_planted(rng, codes, 30, 2, n_sampled=6, n_random=2)
    first = dp.locate_approx(qs, codes, mismatches=2, seed_hits=64)
    # verify against a corrupted text: planted reads now fail the check
    wrong = (codes + 1) & 3
    corrupted = dp.locate_approx(qs, wrong, mismatches=2, seed_hits=64)
    assert corrupted[1].sum() < first[1].sum()
    # and back: the original text's cache entry still answers correctly
    again = dp.locate_approx(qs, codes, mismatches=2, seed_hits=64)
    for a, b in zip(again, first):
        np.testing.assert_array_equal(a, b)


def test_cli_locate_seed_extend(tmp_path, rng, monkeypatch):
    """tpufm locate --mismatches 2: planted 2-error reads recover their
    origin; --mesh output matches single-chip byte-for-byte."""
    from tpufm import cli
    from tpufm.utils.encoding import decode_bases
    from tpufm.io.fasta import write_reference

    monkeypatch.chdir(tmp_path)
    codes = rng.integers(0, 4, size=2500, dtype=np.uint8)
    write_reference("g.fa", decode_bases(codes))
    L = 30
    starts = rng.integers(0, 2500 - L, size=12)
    mut = np.stack([codes[s : s + L].copy() for s in starts])
    for i in range(12):  # plant exactly two errors per read
        for p in rng.choice(L, size=2, replace=False):
            mut[i, p] = (mut[i, p] + rng.integers(1, 4)) & 3
    with open("q.qry", "wb") as fp:
        for i in range(12):
            fp.write(b"> r%d\n%s\n" % (i, decode_bases(mut[i])))
    common = ["locate", "g.fa", "2500", "q.qry", str(L), "12",
              "--k", "3", "--d", "64", "--sample-rate", "8",
              "--mismatches", "2", "--max-hits", "8"]
    cli.main([*common, "--output", "m.pos"])
    lines = open("m.pos").read().splitlines()
    assert len(lines) == 12
    for line, s in zip(lines, starts):
        assert str(int(s)) in line.split()  # origin recovered despite 2 errors
    cli.main([*common, "--mesh", "8", "--output", "mm.pos"])
    assert open("mm.pos").read() == open("m.pos").read()


def test_seed_extend_waved_matches_single(rng):
    codes, index, loc = _setup(rng, n=2000)
    qs = _reads_with_planted(rng, codes, 30, 2, n_sampled=40, n_random=16)
    eng = SeedExtendEngine(index, loc, codes, mismatches=2, seed_hits=64)
    whole = eng.locate_approx(qs)
    waved = eng.locate_approx(qs, wave=13)
    for a, b in zip(whole, waved):
        np.testing.assert_array_equal(a, b)

"""Edit-distance seed-and-extend (`locate --edits E`) — tpufm extension.

Ground truth is the reversed semi-global DP oracle (edit_extend_oracle):
dist[s] = min_e edit(read, text[s:e]) for every start s. Contracts under
test: the Myers verifier is EXACT whenever the true start-anchored
distance is <= E (beyond E the window may truncate the free end — the
reported distance only ever rises, so acceptance stays sound); the engine
reports only genuine <=E alignment start sites, recovers planted
indel-mutated reads, and degrades to exact locate at the E-boundary.
"""

import numpy as np
import pytest

from tpufm.config import IndexConfig
from tpufm.engine.edit import (
    EditExtendEngine,
    build_peq,
    edit_extend_oracle,
    make_myers_verify_fn,
)
from tpufm.engine.seed import pack_text_words
from tpufm.index.builder import build_index
from tpufm.index.locate import build_locate
from tpufm.index.suffix_array import suffix_array

SENT = np.uint32(0xFFFFFFFF)


def test_edit_oracle_matches_scalar_dp(rng):
    """The vectorized reversed-DP oracle vs a direct per-start scalar DP."""
    codes = rng.integers(0, 4, size=60, dtype=np.uint8)
    q = rng.integers(0, 4, size=(1, 9), dtype=np.uint8)
    got = edit_extend_oracle(codes, q, 2)[0]

    def anchored(read, text):
        # min over e of edit(read, text[:e]) — full DP
        L, n = len(read), len(text)
        prev = np.arange(L + 1)
        best = prev[L]
        for j in range(1, n + 1):
            cur = np.empty(L + 1, np.int64)
            cur[0] = j  # anchored: matching past text[0] costs deletions
            for i in range(1, L + 1):
                cur[i] = min(
                    prev[i - 1] + (read[i - 1] != text[j - 1]),
                    prev[i] + 1,
                    cur[i - 1] + 1,
                )
            best = min(best, cur[L])
            prev = cur
        return best

    # NOTE: the oracle's free start in the reversed stream means dist[s]
    # = min_e edit(read, codes[s:e]) — recompute directly per start
    for s in range(60):
        want = anchored(q[0], codes[s:])
        assert got[s] == want, (s, got[s], want)


@pytest.mark.parametrize("L,E", [(17, 1), (33, 2), (70, 3)])
def test_myers_verifier_matches_oracle(rng, L, E):
    import jax
    import jax.numpy as jnp

    n = 800
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    tw = jnp.asarray(pack_text_words(codes))
    B, C = 5, 6
    # half the reads are mutated text windows (so small distances occur)
    qs = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    a = rng.integers(E, n - L - E, size=(B, C))
    for b in range(0, B, 2):
        s0 = int(a[b, 0])
        w = list(codes[s0 : s0 + L + E])
        for _ in range(E):
            op = rng.integers(0, 3)
            p = int(rng.integers(0, len(w) - 1))
            if op == 0:
                w[p] = (w[p] + 1) & 3
            elif op == 1:
                del w[p]
            else:
                w.insert(p, int(rng.integers(0, 4)))
        qs[b] = np.array(w[:L], np.uint8)
    lo = np.maximum(a - E, 0).astype(np.uint32)
    hi = np.minimum(a + E, n - 1).astype(np.uint32)
    valid = np.ones((B, C), bool)
    fn = jax.jit(make_myers_verify_fn(L, E))
    peq = build_peq(jnp.asarray(qs[:, ::-1]), -(-L // 32))[:, None, :, :]
    dist, start = fn(tw, jnp.uint32(n), peq,
                     jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(valid))
    dist, start = np.asarray(dist), np.asarray(start)
    want = edit_extend_oracle(codes, qs, E)
    for b in range(B):
        for c in range(C):
            w = want[b, lo[b, c] : hi[b, c] + 1]
            wmin = w.min()
            if wmin <= E:
                # exact distance AND leftmost-minimal start
                assert dist[b, c] == wmin
                assert start[b, c] == lo[b, c] + np.flatnonzero(w == wmin)[0]
            else:
                # truncation may only RAISE the reported distance
                assert dist[b, c] >= wmin
                assert dist[b, c] > E


def _setup(rng, n=3000, k=2, d=64, s=8):
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    sa = suffix_array(codes, method="doubling")
    index = build_index(codes, IndexConfig(k=k, d=d), sa=sa)
    loc = build_locate(codes, sample_rate=s, d=d, sa=sa)
    return codes, index, loc


def _indel_reads(rng, codes, L, E, n_sampled=20, n_random=6):
    """Reads sampled from the text with exactly E random edits (mixed
    substitution/insert/delete), plus random reads. Returns (reads,
    origins) — origins[i] = -1 for the random reads."""
    reads, origins = [], []
    for _ in range(n_sampled):
        s0 = int(rng.integers(0, len(codes) - L - E))
        w = list(codes[s0 : s0 + L + E])
        for _ in range(E):
            op = rng.integers(0, 3)
            p = int(rng.integers(0, len(w) - 1))
            if op == 0:
                w[p] = (w[p] + int(rng.integers(1, 4))) & 3
            elif op == 1:
                del w[p]
            else:
                w.insert(p, int(rng.integers(0, 4)))
        reads.append(np.array(w[:L], np.uint8))
        origins.append(s0)
    for _ in range(n_random):
        reads.append(rng.integers(0, 4, size=L, dtype=np.uint8))
        origins.append(-1)
    return np.stack(reads), np.asarray(origins)


@pytest.mark.parametrize("E,L,k,lut", [(1, 24, 2, 0), (2, 36, 3, 6), (3, 48, 2, 4)])
def test_edit_extend_sound_and_sensitive(rng, E, L, k, lut):
    codes, index, loc = _setup(rng, k=k)
    eng = EditExtendEngine(
        index, loc, codes, edits=E, seed_hits=64, max_hits=8, lut_m=lut
    )
    qs, origins = _indel_reads(rng, codes, L, E)
    pos, counts, overflow = eng.locate_edits(qs)
    assert not overflow.any(), "random text should not overflow seed_hits=64"
    want = edit_extend_oracle(codes, qs, E)
    for i in range(qs.shape[0]):
        got = pos[i][pos[i] != SENT]
        # sound: every reported site is a true <=E start, distinct, ascending
        assert (np.diff(got.astype(np.int64)) > 0).all()
        for s in got:
            assert want[i, int(s)] <= E
        assert counts[i] >= got.size
        # sensitive: a planted read recovers a site near its origin (the
        # leftmost-minimal site of the origin's +-E window can sit up to
        # 2E left of the origin when an equal-cost alignment starts there)
        if origins[i] >= 0:
            assert got.size and np.abs(got.astype(np.int64) - origins[i]).min() <= 2 * E


def test_edit_extend_counts_match_oracle_sites(rng):
    """counts = number of distinct leftmost-minimal sites the seed filter
    found; with generous caps on random text every <=E site family is hit,
    so each origin start's site must appear."""
    codes, index, loc = _setup(rng, n=2000, k=2)
    E, L = 2, 30
    qs, origins = _indel_reads(rng, codes, L, E, n_sampled=12, n_random=4)
    eng = EditExtendEngine(index, loc, codes, edits=E, seed_hits=128, max_hits=16)
    pos, counts, overflow = eng.locate_edits(qs)
    assert not overflow.any()
    want = edit_extend_oracle(codes, qs, E)
    for i in range(qs.shape[0]):
        got = pos[i][pos[i] != SENT]
        for s in got:
            assert want[i, int(s)] <= E


def test_edit_e0_equivalence_exact(rng):
    """E-boundary: a read that occurs EXACTLY must report its exact
    occurrence positions among the sites (dist 0 dominates)."""
    codes, index, loc = _setup(rng, n=2500, k=2)
    L = 24
    starts = rng.integers(0, 2500 - L, size=10)
    qs = np.stack([codes[s : s + L] for s in starts])
    eng = EditExtendEngine(index, loc, codes, edits=1, seed_hits=64, max_hits=8)
    pos, counts, _ = eng.locate_edits(qs)
    for i, s in enumerate(starts):
        got = pos[i][pos[i] != SENT]
        assert int(s) in got.tolist()


def test_edit_overflow_flagged_on_repeats(rng):
    codes = np.tile(rng.integers(0, 4, size=16, dtype=np.uint8), 100)
    sa = suffix_array(codes, method="doubling")
    index = build_index(codes, IndexConfig(k=2, d=64), sa=sa)
    loc = build_locate(codes, sample_rate=8, d=64, sa=sa)
    eng = EditExtendEngine(index, loc, codes, edits=2, seed_hits=4)
    qs = codes[None, :48].copy()
    pos, counts, overflow = eng.locate_edits(qs)
    assert overflow[0]
    want = edit_extend_oracle(codes, qs, 2)
    for s in pos[0][pos[0] != SENT]:
        assert want[0, int(s)] <= 2  # lower bound, every site real


def test_edit_extend_too_short_raises(rng):
    codes, index, loc = _setup(rng, k=3)
    eng = EditExtendEngine(index, loc, codes, edits=3)
    with pytest.raises(ValueError, match="too short"):
        eng.locate_edits(rng.integers(0, 4, size=(4, 10), dtype=np.uint8))


def test_edit_extend_empty_batch(rng):
    codes, index, loc = _setup(rng)
    eng = EditExtendEngine(index, loc, codes, edits=2)
    pos, counts, overflow = eng.locate_edits(np.zeros((0, 30), np.uint8))
    assert pos.shape == (0, 4) and counts.shape == (0,) and overflow.shape == (0,)


def test_edit_verify_budget_paths_identical(rng):
    """Compacted Myers verify (valid candidates only) and its full-grid
    lax.cond fallback are bit-identical: budget=1 forces the fallback,
    budget=512 the compact path, 0 disables compaction entirely."""
    codes, index, loc = _setup(rng, n=2500, k=2)
    qs, _ = _indel_reads(rng, codes, 33, 2, n_sampled=16, n_random=6)
    outs = [
        EditExtendEngine(
            index, loc, codes, edits=2, seed_hits=64, max_hits=8,
            verify_budget=b,
        ).locate_edits(qs)
        for b in (0, 1, 512, None)
    ]
    for got in outs[1:]:
        for a, b in zip(got, outs[0]):
            np.testing.assert_array_equal(a, b)


def test_edit_chars_pre_matches_inline(rng):
    """chars='pre' (precomputed window chars as scan xs) is bit-identical
    to the default in-register extraction."""
    codes, index, loc = _setup(rng, n=2000, k=2)
    qs, _ = _indel_reads(rng, codes, 33, 2, n_sampled=20, n_random=6)
    a = EditExtendEngine(index, loc, codes, edits=2, seed_hits=64)
    b = EditExtendEngine(index, loc, codes, edits=2, seed_hits=64, chars="pre")
    for x, y in zip(a.locate_edits(qs), b.locate_edits(qs)):
        np.testing.assert_array_equal(x, y)
    with pytest.raises(ValueError, match="chars"):
        EditExtendEngine(index, loc, codes, edits=2, chars="bogus")


def test_edit_extend_data_parallel(rng):
    """DataParallelSearchLocate.locate_edits over the virtual mesh ==
    single-chip EditExtendEngine, including a non-mesh-multiple batch."""
    import jax

    from tpufm.parallel import DataParallelSearchLocate, make_mesh

    codes, index, loc = _setup(rng, n=2500, k=2)
    qs, _ = _indel_reads(rng, codes, 30, 2, n_sampled=13, n_random=8)
    sc = EditExtendEngine(index, loc, codes, edits=2, seed_hits=64, max_hits=8)
    dp = DataParallelSearchLocate(
        index, loc, make_mesh(len(jax.devices())), max_hits=8
    )
    got = dp.locate_edits(qs, codes, edits=2, seed_hits=64)
    want = sc.locate_edits(qs)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_cli_locate_edits(tmp_path, rng, monkeypatch):
    """tpufm locate --edits 2: planted indel reads recover a site within
    2E of their origin; --mesh output matches single-chip byte-for-byte."""
    from tpufm import cli
    from tpufm.io.fasta import write_reference
    from tpufm.utils.encoding import decode_bases

    monkeypatch.chdir(tmp_path)
    codes = rng.integers(0, 4, size=2500, dtype=np.uint8)
    write_reference("g.fa", decode_bases(codes))
    L, E = 30, 2
    qs, origins = _indel_reads(rng, codes, L, E, n_sampled=12, n_random=0)
    with open("q.qry", "wb") as fp:
        for i in range(12):
            fp.write(b"> r%d\n%s\n" % (i, decode_bases(qs[i])))
    common = ["locate", "g.fa", "2500", "q.qry", str(L), "12",
              "--k", "3", "--d", "64", "--sample-rate", "8",
              "--edits", str(E), "--max-hits", "8"]
    cli.main([*common, "--output", "e.pos"])
    lines = open("e.pos").read().splitlines()
    assert len(lines) == 12
    for line, s0 in zip(lines, origins):
        sites = np.array([int(x) for x in line.split()])
        assert sites.size and np.abs(sites - s0).min() <= 2 * E
    cli.main([*common, "--mesh", "8", "--output", "em.pos"])
    assert open("em.pos").read() == open("e.pos").read()
    # both distance models at once is a user error
    with pytest.raises(SystemExit, match="different distance models"):
        cli.main([*common, "--mismatches", "1"])


def test_edit_extend_waved_matches_single(rng):
    codes, index, loc = _setup(rng, n=2000)
    qs, _ = _indel_reads(rng, codes, 30, 2, n_sampled=30, n_random=10)
    eng = EditExtendEngine(index, loc, codes, edits=2, seed_hits=64)
    whole = eng.locate_edits(qs)
    waved = eng.locate_edits(qs, wave=13)
    for a, b in zip(whole, waved):
        np.testing.assert_array_equal(a, b)

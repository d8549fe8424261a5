"""Paired-end placement (engine/paired.py) — tpufm extension.

Ground truth is pair_oracle: exhaustive occurrence cross-join under the
FR insert-size rule on both strands. Planted fragments (R1 + rc tail of
the same fragment) must be recovered with the correct strand; random
pairs must not produce false pairs."""

import numpy as np
import pytest

from tpufm.config import IndexConfig
from tpufm.engine.paired import PairedEndEngine, pair_oracle
from tpufm.index.builder import build_index
from tpufm.index.locate import build_locate
from tpufm.index.suffix_array import suffix_array
from tpufm.utils.encoding import reverse_complement

SENT = np.uint32(0xFFFFFFFF)


def _setup(rng, n=4000, k=2, d=64, s=8):
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    sa = suffix_array(codes, method="doubling")
    index = build_index(codes, IndexConfig(k=k, d=d), sa=sa)
    loc = build_locate(codes, sample_rate=s, d=d, sa=sa)
    return codes, index, loc


def _plant_pairs(rng, codes, L1, L2, imin, imax, B):
    """Fragments on alternating strands: even i -> R1 plus (R1 = fragment
    head, R2 = rc of fragment tail), odd i -> R1 minus (mirrored).
    Returns (r1, r2, expected (left, right, strand))."""
    n = len(codes)
    r1 = np.empty((B, L1), np.uint8)
    r2 = np.empty((B, L2), np.uint8)
    want = []
    for i in range(B):
        f = int(rng.integers(max(imin, L1, L2), imax + 1))
        s0 = int(rng.integers(0, n - f))
        head = codes[s0 : s0 + L1]
        tail = codes[s0 + f - L2 : s0 + f]
        if i % 2 == 0:
            r1[i], r2[i] = head, reverse_complement(tail[None])[0]
            want.append((s0, s0 + f - L2, 0))
        else:
            # minus strand: R2 maps forward at the fragment head, rc(R1)
            # at the tail — i.e. R1 is the rc of the tail, R2 the head
            r1[i] = reverse_complement(codes[s0 + f - L1 : s0 + f][None])[0]
            r2[i] = codes[s0 : s0 + L2]
            want.append((s0, s0 + f - L1, 1))
    return r1, r2, want


@pytest.mark.parametrize("L1,L2,k", [(20, 20, 2), (24, 16, 2), (20, 20, 3)])
def test_paired_recovers_planted_fragments(rng, L1, L2, k):
    # k=3 with L=20: both mates need the any-length tail rounds (L % k != 0)
    codes, index, loc = _setup(rng, k=k)
    imin, imax = 60, 200
    eng = PairedEndEngine(index, loc, imin, imax, max_hits=8, max_pairs=4)
    r1, r2, want = _plant_pairs(rng, codes, L1, L2, imin, imax, 24)
    pairs, strand, counts, _ = eng.pair(r1, r2)
    for i, (wl, wr, ws) in enumerate(want):
        assert counts[i] >= 1
        found = [
            (int(pairs[i, j, 0]), int(pairs[i, j, 1]), int(strand[i, j]))
            for j in range(pairs.shape[1])
            if pairs[i, j, 0] != SENT
        ]
        assert (wl, wr, ws) in found, (i, (wl, wr, ws), found)


def test_paired_matches_oracle_exactly(rng):
    codes, index, loc = _setup(rng, n=3000)
    imin, imax = 40, 150
    L = 16
    eng = PairedEndEngine(index, loc, imin, imax, max_hits=8, max_pairs=8)
    r1, r2, _ = _plant_pairs(rng, codes, L, L, imin, imax, 12)
    # add random pairs (usually no proper placement)
    r1 = np.concatenate([r1, rng.integers(0, 4, size=(6, L), dtype=np.uint8)])
    r2 = np.concatenate([r2, rng.integers(0, 4, size=(6, L), dtype=np.uint8)])
    pairs, strand, counts, _ = eng.pair(r1, r2)
    want = pair_oracle(codes, r1, r2, imin, imax)
    for i in range(r1.shape[0]):
        got = {
            (int(pairs[i, j, 0]), int(pairs[i, j, 1]), int(strand[i, j]))
            for j in range(pairs.shape[1])
            if pairs[i, j, 0] != SENT
        }
        assert counts[i] == len(want[i])
        if counts[i] <= 8:
            assert got == set(want[i])
        else:
            assert got <= set(want[i])


def test_paired_insert_window_filters(rng):
    """A fragment outside the insert window must NOT pair."""
    codes, index, loc = _setup(rng)
    L = 20
    s0 = 500
    f = 300  # fragment longer than imax below
    r1 = codes[None, s0 : s0 + L].copy()
    r2 = reverse_complement(codes[s0 + f - L : s0 + f][None])
    eng = PairedEndEngine(index, loc, 60, 200, max_hits=8, max_pairs=4)
    pairs, strand, counts, _ = eng.pair(r1, r2)
    assert counts[0] == 0
    assert (pairs[0] == SENT).all()
    # widen the window: now it pairs
    eng2 = PairedEndEngine(index, loc, 60, 400, max_hits=8, max_pairs=4)
    _, _, counts2, _ = eng2.pair(r1, r2)
    assert counts2[0] >= 1


def test_paired_overlapping_mates_allowed_crossing_rejected(rng):
    codes, index, loc = _setup(rng)
    L = 20
    s0 = 1000
    # overlapping (fragment 30 < 2L=40) is fine
    f = 30
    r1 = codes[None, s0 : s0 + L].copy()
    r2 = reverse_complement(codes[s0 + f - L : s0 + f][None])
    eng = PairedEndEngine(index, loc, 0, 100, max_hits=8, max_pairs=4)
    _, _, counts, _ = eng.pair(r1, r2)
    assert counts[0] >= 1
    # crossing (R2's rc placement left of R1 start) must not pair even
    # with imin=0: fragment would be < L2
    r2x = reverse_complement(codes[s0 - 15 : s0 + 5][None])
    _, _, countsx, _ = eng.pair(r1, r2x)
    want = pair_oracle(codes, r1, r2x, 0, 100)
    assert countsx[0] == len(want[0])


def test_paired_empty_and_mismatched_batches(rng):
    codes, index, loc = _setup(rng)
    eng = PairedEndEngine(index, loc, 60, 200)
    pairs, strand, counts, _ = eng.pair(
        np.zeros((0, 20), np.uint8), np.zeros((0, 20), np.uint8)
    )
    assert pairs.shape == (0, 4, 2) and counts.shape == (0,)
    with pytest.raises(ValueError, match="differ"):
        eng.pair(np.zeros((2, 20), np.uint8), np.zeros((3, 20), np.uint8))
    with pytest.raises(ValueError, match="insert range"):
        PairedEndEngine(index, loc, 100, 50)


def test_paired_overflow_flagged_in_repeats(rng):
    """A mate whose occurrence interval exceeds max_hits flags overflow
    (the join saw only its first max_hits SA-order positions — pair lists
    become lower bounds), while unique mates stay unflagged."""
    unit = rng.integers(0, 4, size=25, dtype=np.uint8)
    codes = np.concatenate([np.tile(unit, 20), rng.integers(0, 4, size=500, dtype=np.uint8)])
    sa = suffix_array(codes, method="doubling")
    index = build_index(codes, IndexConfig(k=2, d=64), sa=sa)
    loc = build_locate(codes, sample_rate=8, d=64, sa=sa)
    eng = PairedEndEngine(index, loc, 0, 1000, max_hits=4, max_pairs=4)
    r1 = unit[None, :20].copy()            # ~20 occurrences > max_hits=4
    r2 = reverse_complement(codes[520:540][None])  # unique tail mate
    _, _, _, overflow = eng.pair(r1, r2)
    assert overflow[0]
    u1 = codes[None, 510:530].copy()
    _, _, _, ovf2 = eng.pair(u1, r2)
    assert not ovf2[0]


def test_cli_locate_paired(tmp_path, rng, monkeypatch):
    """tpufm locate --paired: planted fragments recovered with strand;
    --mesh output matches single-chip byte-for-byte."""
    from tpufm import cli
    from tpufm.io.fasta import write_reference
    from tpufm.utils.encoding import decode_bases

    monkeypatch.chdir(tmp_path)
    codes = rng.integers(0, 4, size=4000, dtype=np.uint8)
    write_reference("g.fa", decode_bases(codes))
    L, imin, imax = 20, 60, 200
    r1, r2, want = _plant_pairs(rng, codes, L, L, imin, imax, 10)
    for name, arr in (("r1.qry", r1), ("r2.qry", r2)):
        with open(name, "wb") as fp:
            for i in range(10):
                fp.write(b"> p%d\n%s\n" % (i, decode_bases(arr[i])))
    common = ["locate", "g.fa", "4000", "r1.qry", str(L), "10",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--paired", "r2.qry", "--insert-min", str(imin),
              "--insert-max", str(imax)]
    cli.main([*common, "--output", "p.pairs"])
    lines = open("p.pairs").read().splitlines()
    assert len(lines) == 10
    for line, (wl, wr, ws) in zip(lines, want):
        assert f"{wl}:{wr}:{'+' if ws == 0 else '-'}" in line.split()
    cli.main([*common, "--mesh", "8", "--output", "pm.pairs"])
    assert open("pm.pairs").read() == open("p.pairs").read()
    # incompatible-mode guard
    with pytest.raises(SystemExit, match="paired"):
        cli.main([*common, "--rc"])


def test_genreads_paired_roundtrip(tmp_path, rng, monkeypatch):
    """genreads --paired -> locate --paired recovers every planted truth
    pair; --contigs formats both mates through the record map."""
    from tpufm import cli
    from tpufm.io.fasta import write_reference
    from tpufm.io.genreads import generate_read_pairs
    from tpufm.utils.encoding import decode_bases

    monkeypatch.chdir(tmp_path)
    codes = rng.integers(0, 4, size=5000, dtype=np.uint8)
    # two records so --contigs is meaningful
    with open("g.fa", "wb") as fp:
        fp.write(b">chrA\n" + decode_bases(codes[:3000]) + b"\n")
        fp.write(b">chrB\n" + decode_bases(codes[3000:]) + b"\n")
    L, imin, imax, B = 20, 100, 300, 16
    cli.main(["genreads", "g.fa", "5000", str(L), str(B), "--paired",
              "--insert-min", str(imin), "--insert-max", str(imax),
              "--seed", "5", "--output", "p"])
    # the CLI's pairs must match the library generator's truth
    _, _, (ls, rs, minus) = generate_read_pairs(
        codes, L, B, imin, imax, seed=5, return_truth=True
    )
    cli.main(["locate", "g.fa", "5000", "p_1.qry", str(L), str(B),
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--paired", "p_2.qry", "--insert-min", str(imin),
              "--insert-max", str(imax), "--output", "p.pairs"])
    lines = open("p.pairs").read().splitlines()
    assert len(lines) == B
    for i, line in enumerate(lines):
        sym = "-" if minus[i] else "+"
        assert f"{ls[i]}:{rs[i]}:{sym}" in line.split()
    # contig-labelled pairs
    cli.main(["locate", "g.fa", "5000", "p_1.qry", str(L), str(B),
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--paired", "p_2.qry", "--insert-min", str(imin),
              "--insert-max", str(imax), "--contigs",
              "--output", "pc.pairs"])
    clines = open("pc.pairs").read().splitlines()
    for i, line in enumerate(clines):
        want_l = (f"chrA:{ls[i]}" if ls[i] < 3000 else f"chrB:{ls[i]-3000}")
        tok = next(t for t in line.split() if t.startswith(want_l + ":"))
        assert tok.endswith(":" + ("-" if minus[i] else "+"))


def test_generate_read_pairs_truth(rng):
    from tpufm.io.genreads import generate_read_pairs
    from tpufm.utils.encoding import reverse_complement

    codes = rng.integers(0, 4, size=2000, dtype=np.uint8)
    r1, r2, (ls, rs, minus) = generate_read_pairs(
        codes, 18, 20, 50, 120, seed=3, return_truth=True
    )
    for i in range(20):
        frag = rs[i] + 18 - ls[i]
        assert 50 <= frag <= 120
        head, tail = codes[ls[i] : ls[i] + 18], codes[rs[i] : rs[i] + 18]
        if minus[i]:
            np.testing.assert_array_equal(r2[i], head)
            np.testing.assert_array_equal(
                r1[i], reverse_complement(tail[None])[0]
            )
        else:
            np.testing.assert_array_equal(r1[i], head)
            np.testing.assert_array_equal(
                r2[i], reverse_complement(tail[None])[0]
            )
    with pytest.raises(ValueError, match="insert range"):
        generate_read_pairs(codes, 30, 4, 10, 20)


def test_paired_mesh_matches_single(rng):
    import jax

    from tpufm.parallel import make_mesh

    codes, index, loc = _setup(rng, n=3000)
    imin, imax = 40, 150
    L = 16
    r1, r2, _ = _plant_pairs(rng, codes, L, L, imin, imax, 13)
    sc = PairedEndEngine(index, loc, imin, imax, max_hits=8, max_pairs=4)
    dp = PairedEndEngine(
        index, loc, imin, imax, max_hits=8, max_pairs=4,
        mesh=make_mesh(len(jax.devices())),
    )
    got = dp.pair(r1, r2)
    want = sc.pair(r1, r2)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_paired_with_mismatches(rng):
    """PairedEndEngine(mismatches=m): pairs recover when each mate
    carries planted substitutions that break exact pairing."""
    codes, index, loc = _setup(rng, n=4000, k=2)
    imin, imax, L = 60, 200, 24
    r1, r2, want = _plant_pairs(rng, codes, L, L, imin, imax, 10)
    for i in range(10):  # one substitution per mate
        for arr in (r1, r2):
            p = int(rng.integers(0, L))
            arr[i, p] = (arr[i, p] + 1) & 3
    exact = PairedEndEngine(index, loc, imin, imax, max_hits=8, max_pairs=4)
    _, _, c0, _ = exact.pair(r1, r2)
    for m, kwargs in ((1, {}), (2, {"text": codes})):
        eng = PairedEndEngine(
            index, loc, imin, imax, max_hits=8, max_pairs=4,
            mismatches=m, seed_hits=64, **kwargs,
        )
        pairs, strand, counts, overflow = eng.pair(r1, r2)
        rec = 0
        for i, (wl, wr, ws) in enumerate(want):
            rec += any(
                pairs[i, j, 0] == wl and pairs[i, j, 1] == wr
                and strand[i, j] == ws
                for j in range(4)
            )
        # approximate pairing recovers what exact pairing lost
        assert rec == 10, (m, rec)
        assert (counts >= c0).all()
    with pytest.raises(ValueError, match="reference text"):
        PairedEndEngine(index, loc, imin, imax, mismatches=2)


def test_cli_paired_mismatches(tmp_path, rng, monkeypatch):
    from tpufm import cli
    from tpufm.io.fasta import write_reference
    from tpufm.utils.encoding import decode_bases

    monkeypatch.chdir(tmp_path)
    codes = rng.integers(0, 4, size=4000, dtype=np.uint8)
    write_reference("g.fa", decode_bases(codes))
    L, imin, imax = 24, 60, 200
    r1, r2, want = _plant_pairs(rng, codes, L, L, imin, imax, 8)
    for i in range(8):
        p = int(rng.integers(0, L))
        r1[i, p] = (r1[i, p] + 1) & 3
    for name, arr in (("r1.qry", r1), ("r2.qry", r2)):
        with open(name, "wb") as fp:
            for i in range(8):
                fp.write(b"> p%d\n%s\n" % (i, decode_bases(arr[i])))
    cli.main(["locate", "g.fa", "4000", "r1.qry", str(L), "8",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--paired", "r2.qry", "--insert-min", str(imin),
              "--insert-max", str(imax), "--mismatches", "1",
              "--output", "p.pairs"])
    lines = open("p.pairs").read().splitlines()
    for line, (wl, wr, ws) in zip(lines, want):
        assert f"{wl}:{wr}:{'+' if ws == 0 else '-'}" in line.split()


def test_paired_with_edits(rng):
    """PairedEndEngine(edits=E): pairs recover when each mate carries a
    planted indel that breaks exact AND Hamming pairing."""
    codes, index, loc = _setup(rng, n=4000, k=2)
    imin, imax, L = 80, 250, 30
    r1, r2, want = _plant_pairs(rng, codes, L, L, imin, imax, 8)

    def with_deletion(w):  # true deletion: L+1 window bases minus one
        p = int(rng.integers(1, L))
        return np.delete(w[: L + 1], p)[:L]

    for i, (wl, wr, ws) in enumerate(want):
        assert wr + L + 1 <= len(codes)
        head = with_deletion(codes[wl : wl + L + 1])
        tail = with_deletion(codes[wr : wr + L + 1])
        if ws == 0:   # R1 forward at left, rc(R2) at right
            r1[i] = head
            r2[i] = reverse_complement(tail[None])[0]
        else:         # R2 forward at left, rc(R1) at right
            r2[i] = head
            r1[i] = reverse_complement(tail[None])[0]
    eng = PairedEndEngine(
        index, loc, imin, imax, max_hits=8, max_pairs=4,
        edits=1, seed_hits=64, text=codes,
    )
    pairs, strand, counts, overflow = eng.pair(r1, r2)
    rec = 0
    for i, (wl, wr, ws) in enumerate(want):
        # edit sites sit within 2E of the truth and strands must agree
        rec += any(
            pairs[i, j, 0] != SENT
            and abs(int(pairs[i, j, 0]) - wl) <= 2
            and abs(int(pairs[i, j, 1]) - wr) <= 2
            and strand[i, j] == ws
            for j in range(4)
        )
    assert rec == 8, rec
    with pytest.raises(ValueError, match="different distance"):
        PairedEndEngine(index, loc, imin, imax, mismatches=1, edits=1,
                        text=codes)

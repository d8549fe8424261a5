"""Reverse-complement (minus-strand) search/locate — `--rc`.

An FM-index holds one strand; aligning real reads means probing both. With
A=0,C=1,G=2,T=3 the complement is 3 - code, so rc(q) = 3 - q[::-1] and the
minus-strand pass is just rc(q) riding the same batch (one engine program,
2B reads). The reference suite has no strand support at all.
"""

import numpy as np

from tpufm import cli
from tpufm.config import IndexConfig
from tpufm.engine.oracle import search_oracle
from tpufm.index.builder import build_index
from tpufm.io.results import load_results
from tpufm.utils.encoding import decode_bases, encode_bases, reverse_complement


def test_reverse_complement_involution(rng):
    q = rng.integers(0, 4, size=(16, 31), dtype=np.uint8)
    np.testing.assert_array_equal(reverse_complement(reverse_complement(q)), q)
    # ACGT -> TGCA reversed-complemented is ACGT's complement read backward
    assert decode_bases(reverse_complement(encode_bases(b"ACGT"))) == b"ACGT"
    assert decode_bases(reverse_complement(encode_bases(b"AACG"))) == b"CGTT"


def test_rc_search_finds_minus_strand(rng):
    codes = rng.integers(0, 4, size=3000, dtype=np.uint8)
    index = build_index(codes, IndexConfig(k=2, d=64), sa_method="doubling")
    qlen = 24
    starts = rng.integers(0, 3000 - qlen, size=32)
    subs = np.stack([codes[s : s + qlen] for s in starts])
    reads = reverse_complement(subs)  # minus-strand reads
    rc_iv = search_oracle(index, reverse_complement(reads))
    np.testing.assert_array_equal(rc_iv, search_oracle(index, subs))
    assert (rc_iv[:, 1] > rc_iv[:, 0]).all()


def test_cli_search_rc(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    codes = rng.integers(0, 4, size=4000, dtype=np.uint8)
    from tpufm.io.fasta import write_reference

    write_reference("ref.fa", decode_bases(codes))
    cli.main(["build", "ref.fa", "4000", "--k", "2", "--d", "64"])
    fmi = "ref.fa.4000.64fmi2steps.fmi"

    qlen = 24
    starts = rng.integers(0, 4000 - qlen, size=48)
    subs = np.stack([codes[s : s + qlen] for s in starts])
    reads = reverse_complement(subs)
    with open("q.qry", "wb") as fp:
        for i in range(48):
            fp.write(b"> r%d\n%s\n" % (i, decode_bases(reads[i])))

    cli.main(["search", fmi, "q.qry", str(qlen), "48", "--iterations", "1",
              "--rc", "--output", "fwd.res"])
    index = build_index(codes, IndexConfig(k=2, d=64), sa_method="doubling")
    np.testing.assert_array_equal(
        load_results("fwd.res"), search_oracle(index, reads)
    )
    np.testing.assert_array_equal(
        load_results("fwd.res.rc"), search_oracle(index, subs)
    )
    rc = load_results("fwd.res.rc")
    assert (rc[:, 1] > rc[:, 0]).all()  # every minus-strand read hits


def test_cli_locate_rc(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    codes = rng.integers(0, 4, size=3000, dtype=np.uint8)
    from tpufm.io.fasta import write_reference

    write_reference("g.fa", decode_bases(codes))
    qlen = 20
    starts = rng.integers(0, 3000 - qlen, size=24)
    reads = reverse_complement(
        np.stack([codes[s : s + qlen] for s in starts])
    )
    with open("q.qry", "wb") as fp:
        for i in range(24):
            fp.write(b"> r%d\n%s\n" % (i, decode_bases(reads[i])))

    cli.main(["locate", "g.fa", "3000", "q.qry", str(qlen), "24",
              "--k", "2", "--d", "64", "--sample-rate", "8", "--rc",
              "--output", "o.pos"])
    rc_lines = open("o.pos.rc").read().splitlines()
    assert len(rc_lines) == 24
    for line, s in zip(rc_lines, starts):
        assert str(int(s)) in line.split()

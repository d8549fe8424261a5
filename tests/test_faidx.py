"""FASTA .fai index + seek-based region fetch (tpufm/io/faidx.py) — the
samtools-faidx companion. Load-bearing test is differential: every fetch
must equal slicing the in-memory sequence, across records with different
line widths, \r\n endings, short final lines, and random regions."""

import gzip

import numpy as np
import pytest

from tpufm import cli
from tpufm.io.faidx import build_fai, fetch, load_fai
from tpufm.utils.encoding import decode_bases


def _mk_fasta(path, rng, specs, crlf=False):
    """specs: [(name, length, linebases)] -> {name: seq bytes}."""
    eol = b"\r\n" if crlf else b"\n"
    seqs = {}
    with open(path, "wb") as fp:
        for name, ln, width in specs:
            seq = decode_bases(rng.integers(0, 4, ln, dtype=np.uint8))
            seqs[name] = seq
            fp.write(b">" + name.encode() + b" some description" + eol)
            for off in range(0, ln, width):
                fp.write(seq[off : off + width] + eol)
    return seqs


@pytest.mark.parametrize("crlf", [False, True])
def test_fetch_matches_slice(tmp_path, rng, crlf):
    path = str(tmp_path / "g.fa")
    specs = [("chr1", 5000, 70), ("chr2", 3001, 60), ("chr3", 59, 60)]
    seqs = _mk_fasta(path, rng, specs, crlf=crlf)
    rows = build_fai(path)
    assert [(r[0], r[1]) for r in rows] == [(n, l) for n, l, _ in specs]
    fai = load_fai(path)
    assert fai["chr2"][0] == 3001 and fai["chr2"][2] == 60
    assert fai["chr2"][3] == 60 + (2 if crlf else 1)
    for name, ln, _ in specs:
        for _ in range(25):
            beg = int(rng.integers(0, ln))
            end = beg + int(rng.integers(1, ln))
            assert fetch(path, name, beg, end, fai=fai) == \
                seqs[name][beg:end], (name, beg, end, crlf)
        # whole record, empty span, past-the-end clamp
        assert fetch(path, name, fai=fai) == seqs[name]
        assert fetch(path, name, 5, 5, fai=fai) == b""
        assert fetch(path, name, ln - 3, ln + 99, fai=fai) == seqs[name][-3:]


def test_fai_errors(tmp_path, rng):
    ragged = tmp_path / "r.fa"
    ragged.write_bytes(b">c\nACGTACGT\nACG\nACGTACGT\n")
    with pytest.raises(ValueError, match="differing length"):
        build_fai(str(ragged))
    longline = tmp_path / "l.fa"
    longline.write_bytes(b">c\nACGT\nACGTACGT\n")
    with pytest.raises(ValueError, match="differing length"):
        build_fai(str(longline))
    gz = tmp_path / "g.fa.gz"
    gz.write_bytes(gzip.compress(b">c\nACGT\n"))
    with pytest.raises(ValueError, match="gzip"):
        build_fai(str(gz))
    headerless = tmp_path / "h.fa"
    headerless.write_bytes(b"ACGT\n")
    with pytest.raises(ValueError, match="before any '>'"):
        build_fai(str(headerless))
    ok = tmp_path / "ok.fa"
    ok.write_bytes(b">c\nACGTACGT\nACG\n")  # short LAST line is legal
    assert build_fai(str(ok))[0][1] == 11
    with pytest.raises(KeyError, match="not a sequence"):
        fetch(str(ok), "chrX")
    # a blank line INSIDE a sequence breaks the offset arithmetic: must
    # error, never silently index (fetch would return wrong bases)
    blank_mid = tmp_path / "bm.fa"
    blank_mid.write_bytes(b">c\nACGT\n\nACGT\n")
    with pytest.raises(ValueError, match="differing length"):
        build_fai(str(blank_mid))
    # trailing blank lines after the last base are harmless
    blank_tail = tmp_path / "bt.fa"
    blank_tail.write_bytes(b">c\nACGT\nAC\n\n\n>d\nGGGG\n")
    rows = build_fai(str(blank_tail))
    assert [(r[0], r[1]) for r in rows] == [("c", 6), ("d", 4)]
    assert fetch(str(blank_tail), "c", 2, 6) == b"GTAC"
    assert fetch(str(blank_tail), "d") == b"GGGG"
    # blank line between header and first base: offset must skip it
    blank_head = tmp_path / "bh.fa"
    blank_head.write_bytes(b">c\n\nACGT\nAC\n")
    assert fetch(str(blank_head), "c", 1, 5) == b"CGTA"


def test_cli_faidx(tmp_path, rng, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    seqs = _mk_fasta("g.fa", rng, [("cA", 500, 70), ("cB", 200, 50)])
    cli.main(["faidx", "g.fa"])
    assert "2 sequences" in capsys.readouterr().out
    assert (tmp_path / "g.fa.fai").exists()
    cli.main(["faidx", "g.fa", "cA:11-40", "cB", "--output", "o.fa"])
    out = open("o.fa").read().splitlines()
    assert out[0] == ">cA:11-40" and out[1] == seqs["cA"][10:40].decode()
    i = out.index(">cB")
    assert "".join(out[i + 1 :]) == seqs["cB"].decode()
    assert all(len(l) <= 60 for l in out[i + 1 :])
    with pytest.raises(SystemExit, match="not a sequence"):
        cli.main(["faidx", "g.fa", "chrZ:1-5"])

"""Multi-FASTA contig map: absolute locate positions -> chromosome:offset.

The index concatenates every record's sequence (matching the reference's
readRef, common/common.c:42-76); ContigMap resolves concatenated-space
positions back to (record, offset) and flags matches that cross a record
boundary (artifacts of the concatenation).
"""

import numpy as np
import pytest

from tpufm.io.contigs import ContigMap, read_contigs
from tpufm.utils.encoding import decode_bases


def _write_multifasta(path, seqs, names=None, width=10):
    with open(path, "wb") as fp:
        for i, seq in enumerate(seqs):
            name = (names[i] if names else f"chr{i + 1}").encode()
            fp.write(b">" + name + b" extra words\n")
            for off in range(0, len(seq), width):
                fp.write(seq[off : off + width] + b"\n")


def test_read_contigs_boundaries(tmp_path, rng):
    seqs = [
        decode_bases(rng.integers(0, 4, size=n, dtype=np.uint8))
        for n in (25, 7, 40)
    ]
    path = tmp_path / "multi.fa"
    _write_multifasta(path, seqs)
    cmap = read_contigs(path)
    assert cmap.names == ["chr1", "chr2", "chr3"]
    np.testing.assert_array_equal(cmap.starts, [0, 25, 32])
    assert cmap.total == 72


def test_read_contigs_refsize_truncation(tmp_path, rng):
    seqs = [decode_bases(rng.integers(0, 4, size=20, dtype=np.uint8))] * 3
    path = tmp_path / "multi.fa"
    _write_multifasta(path, seqs)
    cmap = read_contigs(path, refsize=30)
    # the third record is entirely truncated away
    assert cmap.names == ["chr1", "chr2"]
    assert cmap.total == 30


def test_resolve_and_spans():
    cmap = ContigMap(names=["a", "b"], starts=np.array([0, 10]), total=18)
    pos = np.array([0, 9, 10, 17, 0xFFFFFFFF], dtype=np.uint32)
    idx, off, spans = cmap.resolve(pos, query_len=3)
    np.testing.assert_array_equal(idx, [0, 0, 1, 1, -1])
    np.testing.assert_array_equal(off, [0, 9, 0, 7, 0])
    # pos 9 + len 3 crosses into 'b'; pos 17 + 3 runs past the text end
    np.testing.assert_array_equal(spans, [False, True, False, True, False])
    labels = cmap.format(pos, query_len=3)
    assert labels == ["a:0", "a:9:spans", "b:0", "b:7:spans", None]


def test_cli_locate_contigs(tmp_path, rng, monkeypatch):
    """End-to-end: reads sampled INSIDE records resolve to name:offset with
    no spans flag, and the offsets reproduce the read bytes."""
    from tpufm import cli
    from tpufm.utils.encoding import encode_bases

    monkeypatch.chdir(tmp_path)
    codes = [rng.integers(0, 4, size=n, dtype=np.uint8) for n in (900, 1100)]
    _write_multifasta(tmp_path / "g.fa", [decode_bases(c) for c in codes],
                      names=["chrA", "chrB"], width=70)
    # 16 reads fully inside each record
    qlen = 24
    lines = []
    truth = []
    for name, c in zip(["chrA", "chrB"], codes):
        for s in rng.integers(0, len(c) - qlen, size=16):
            lines.append(decode_bases(c[s : s + qlen]))
            truth.append((name, int(s)))
    with open("q.qry", "wb") as fp:
        for i, seq in enumerate(lines):
            fp.write(b"> read%d\n%s\n" % (i, seq))

    cli.main(["locate", "g.fa", "2000", "q.qry", str(qlen), "32",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--contigs", "--output", "c.pos"])
    out = (tmp_path / "c.pos").read_text().splitlines()
    assert len(out) == 32
    cat = {"chrA": codes[0], "chrB": codes[1]}
    for line, seq, (name, s) in zip(out, lines, truth):
        entries = line.split()
        assert entries, "sampled read lost all hits"
        assert f"{name}:{s}" in entries
        for e in entries:
            if e.endswith(":spans"):
                continue  # boundary-crossing artifact, correctly flagged
            nm, off = e.rsplit(":", 1)
            got = cat[nm][int(off) : int(off) + qlen]
            assert decode_bases(got) == seq

"""Coordinate sort + BAI index + region query + flagstat
(tpufm/io/bam_index.py) — tpufm extension beyond the reference suite
(which stops at interval text, common/searchQueries.c:100-118).

The load-bearing test is differential: every indexed region query must
return exactly the records a brute-force overlap scan of the full file
returns, across random regions, multiple contigs, and files large enough
that records span multiple bgzf members."""

import re

import numpy as np
import pytest

from tpufm import cli
from tpufm.io.bam import BGZF_STEP, read_bam
from tpufm.io.bam_index import (
    IndexedBam,
    decode_record,
    flagstat,
    load_bai,
    reg2bins,
    sort_sam_text,
    write_bam_indexed,
)
from tpufm.io.bam import reg2bin
from tpufm.utils.encoding import decode_bases


def _mk_sam(rng, n_reads, contigs, L=24, secondary_every=7):
    """Synthetic SAM text with shuffled coordinates, a '*' unmapped
    tail, secondary records, and D-CIGARs (so ref span != L)."""
    header = ["@HD\tVN:1.6\tSO:unknown"]
    for name, ln in contigs:
        header.append(f"@SQ\tSN:{name}\tLN:{ln}")
    header.append("@PG\tID:tpufm\tPN:tpufm")
    recs = []
    for i in range(n_reads):
        name, ln = contigs[int(rng.integers(len(contigs)))]
        pos1 = int(rng.integers(1, ln - 2 * L))
        flag = 0 if rng.integers(2) else 16
        if i % secondary_every == 0:
            flag |= 0x100
        cigar = f"{L}M" if i % 3 else f"{L - 4}M2D{4}M"
        seq = "ACGT" * (L // 4)
        recs.append(f"r{i}\t{flag}\t{name}\t{pos1}\t60\t{cigar}\t*\t0\t0"
                    f"\t{seq}\t*\tNM:i:0")
    for i in range(4):
        recs.append(f"u{i}\t4\t*\t0\t0\t*\t*\t0\t0\t{'A' * L}\t*")
    return "\n".join(header + recs) + "\n"


def _span(cigar):
    return sum(int(n) for n, op in re.findall(r"(\d+)([MIDNSHP=X])", cigar)
               if op in "MDN=X")


def _brute(records, contig, beg, end):
    out = []
    for f in records:
        if f[2] != contig:
            continue
        pos0 = int(f[3]) - 1
        if pos0 < end and pos0 + max(_span(f[5]), 1) > beg:
            out.append(f)
    return out


def test_sort_sam_text(rng):
    contigs = [("c1", 100_000), ("c2", 50_000)]
    text = sort_sam_text(_mk_sam(rng, 200, contigs))
    lines = text.splitlines()
    assert lines[0].endswith("SO:coordinate")
    body = [l.split("\t") for l in lines if not l.startswith("@")]
    rank = {"c1": 0, "c2": 1}
    keys = [(0, rank[f[2]], int(f[3])) if f[2] != "*" else (1, 0, 0)
            for f in body]
    assert keys == sorted(keys)
    assert body[-4][0].startswith("u")  # unmapped tail


def test_reg2bins_covers_reg2bin():
    rng = np.random.default_rng(0)
    for _ in range(500):
        beg = int(rng.integers(0, 1 << 28))
        end = beg + int(rng.integers(1, 1 << 16))
        assert reg2bin(beg, end) in reg2bins(beg, end)


def test_bai_query_matches_bruteforce(tmp_path, rng):
    contigs = [("chrA", 1 << 20), ("chrB", 1 << 18)]
    text = _mk_sam(rng, 3000, contigs)  # ~3000 records > 3 bgzf members
    bam = str(tmp_path / "x.bam")
    write_bam_indexed(bam, text)
    _, all_recs = read_bam(bam)
    assert len(open(bam, "rb").read()) > 0
    # the file must actually span multiple members for this to test
    # cross-member reads
    from tpufm.io.bam import bgzf_decompress
    assert len(bgzf_decompress(open(bam, "rb").read())) > 2 * BGZF_STEP
    ib = IndexedBam(bam)
    assert ib.ref_names == ["chrA", "chrB"]
    for _ in range(40):
        contig, ln = contigs[int(rng.integers(2))]
        beg = int(rng.integers(0, ln))
        end = beg + int(rng.integers(1, ln // 4))
        got = [decode_record(r, ib.ref_names)
               for r in ib.query(contig, beg, end)]
        want = _brute(all_recs, contig, beg, end)
        assert sorted(map(tuple, got)) == sorted(map(tuple, want)), (
            contig, beg, end, len(got), len(want))
    # empty region
    assert ib.query("chrB", (1 << 18) - 2, (1 << 18) - 1) == [] or all(
        int(decode_record(r, ib.ref_names)[3]) - 1 < (1 << 18)
        for r in ib.query("chrB", (1 << 18) - 2, (1 << 18) - 1)
    )


def test_bai_loads_and_prunes(tmp_path, rng):
    contigs = [("c", 1 << 19)]
    bam = str(tmp_path / "y.bam")
    write_bam_indexed(bam, _mk_sam(rng, 1500, contigs))
    bins, linear = load_bai(bam + ".bai")
    assert len(bins) == 1 and len(linear) == 1
    assert sum(len(v) for v in bins[0].values()) >= 1
    # ioffsets are non-decreasing the way we fill gaps
    lin = linear[0]
    assert all(lin[i] <= lin[i + 1] or lin[i + 1] == 0
               for i in range(len(lin) - 1))


def test_flagstat_counts(rng):
    text = _mk_sam(rng, 140, [("c", 1 << 16)])
    recs = [l.split("\t") for l in text.splitlines()
            if not l.startswith("@")]
    c = flagstat(recs)
    assert c["total"] == 144
    assert c["secondary"] == 20  # ceil(140/7)
    assert c["mapped"] == 140 and c["primary"] == 124
    assert c["primary_mapped"] == 120
    assert c["paired"] == 0


def test_cli_sort_view_flagstat(tmp_path, rng, monkeypatch, capsys):
    """End-to-end: align reads -> SAM -> tpufm sort -> tpufm view REGION
    -> the planted read comes back; flagstat counts check out."""
    monkeypatch.chdir(tmp_path)
    n, L = 4000, 24
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    with open("g.fa", "wb") as fp:
        fp.write(b">c\n" + decode_bases(codes) + b"\n")
    starts = [50, 1200, 3300]
    with open("q.qry", "wb") as fp:
        for i, s in enumerate(starts):
            fp.write(b"> p%d\n%s\n" % (i, decode_bases(codes[s : s + L])))
    cli.main(["locate", "g.fa", str(n), "q.qry", str(L), "3",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--sam", "--output", "o.sam"])
    cli.main(["sort", "o.sam", "--output", "s.bam"])
    assert (tmp_path / "s.bam.bai").exists()
    header, recs = read_bam("s.bam")
    assert "SO:coordinate" in header.splitlines()[0]
    poss = [int(r[3]) for r in recs if r[2] != "*"]
    assert poss == sorted(poss)
    cli.main(["view", "s.bam", "c:1201-1224", "--no-header",
              "--output", "v.sam"])
    got = [l.split("\t") for l in open("v.sam").read().splitlines()]
    assert [g[0] for g in got] == ["p1"] and got[0][3] == "1201"
    capsys.readouterr()
    cli.main(["flagstat", "s.bam"])
    out = capsys.readouterr().out
    assert out.splitlines()[0].startswith("3 in total")
    assert "3 mapped" in out


def test_view_cli_errors(tmp_path, rng, monkeypatch, capsys):
    """Region queries without a .bai, bad region syntax, and unknown
    contigs exit with actionable messages instead of tracebacks."""
    contigs = [("c", 1 << 16)]
    text = _mk_sam(rng, 20, contigs)
    from tpufm.io.bam import write_bam

    monkeypatch.chdir(tmp_path)
    write_bam("plain.bam", text)
    with pytest.raises(SystemExit, match="tpufm sort"):
        cli.main(["view", "plain.bam", "c:1-100"])
    write_bam_indexed("idx.bam", text)
    with pytest.raises(SystemExit, match="not a contig"):
        cli.main(["view", "idx.bam", "chrX:1-100"])
    with pytest.raises(SystemExit, match="bad region"):
        cli.main(["view", "idx.bam", "c:1:100"])


def test_bai_exact_step_boundary(tmp_path):
    """A BAM whose uncompressed stream length is an exact BGZF_STEP
    multiple: the final record's chunk end must map to the EOF-member
    sentinel voffset (not invert), and indexed queries must still find
    that record (regression for _voffset's one-past-end case)."""
    import math

    from tpufm.io.bam import sam_to_bam

    header = "@HD\tVN:1.6\n@SQ\tSN:c\tLN:%d\n" % (1 << 18)
    last = ("zz_last\t0\tc\t200000\t60\t24M\t*\t0\t0\t"
            + "ACGT" * 6 + "\t*")

    def mk(pads):
        # fixed-width index so every pad record is exactly rec0 + p bytes
        recs = [
            f"p{i:05d}{'x' * p}\t0\tc\t{10 + i}\t60\t4M\t*\t0\t0\tACGT\t*"
            for i, p in enumerate(pads)
        ]
        return header + "\n".join(recs + [last]) + "\n"

    base = len(sam_to_bam(sort_sam_text(mk([]))))
    rec0 = len(sam_to_bam(sort_sam_text(mk([0])))) - base
    assert len(sam_to_bam(sort_sam_text(mk([1])))) == base + rec0 + 1
    # pick pad-record QNAME lengths so the stream is an exact multiple
    delta = (-base) % BGZF_STEP
    m = max(1, math.ceil(delta / (rec0 + 200)))
    while m * rec0 > delta:
        delta += BGZF_STEP
        m = max(1, math.ceil(delta / (rec0 + 200)))
    spare = delta - m * rec0
    pads = []
    for _ in range(m):
        take = min(200, spare)
        pads.append(take)
        spare -= take
    assert spare == 0
    text = mk(pads)
    assert len(sam_to_bam(sort_sam_text(text))) % BGZF_STEP == 0
    bam = str(tmp_path / "edge.bam")
    write_bam_indexed(bam, text)
    bins, _ = load_bai(bam + ".bai")
    for bd in bins:
        for chunks in bd.values():
            for vs, ve in chunks:
                assert ve > vs, (vs, ve)
    ib = IndexedBam(bam)
    got = [decode_record(r, ib.ref_names)
           for r in ib.query("c", 199_999, 200_024)]
    assert [g[0] for g in got] == ["zz_last"]


def test_view_region_begin_zero(tmp_path, monkeypatch):
    """samtools semantics: a 1-based region begin of 0 clamps to the
    contig start instead of silently returning nothing, and an empty
    region (end < beg) is rejected."""
    monkeypatch.chdir(tmp_path)
    header = "@HD\tVN:1.6\n@SQ\tSN:c\tLN:%d\n" % (1 << 17)
    recs = [f"r{i}\t0\tc\t{1 + 7 * i}\t60\t8M\t*\t0\t0\tACGTACGT\t*"
            for i in range(64)]
    write_bam_indexed("z.bam", header + "\n".join(recs) + "\n")
    cli.main(["view", "z.bam", "c:1-64", "--no-header",
              "--output", "a.sam"])
    cli.main(["view", "z.bam", "c:0-64", "--no-header",
              "--output", "b.sam"])
    a, b = open("a.sam").read(), open("b.sam").read()
    assert a == b and a  # non-empty thanks to pos>=1 records near start
    with pytest.raises(SystemExit, match="empty region"):
        cli.main(["view", "z.bam", "c:5-4"])


def test_flagstat_ignores_secondary_for_pairing(rng):
    """The pairing counters follow samtools: secondary records carry the
    0x1/0x2/0x40/0x80 bits too but must not inflate paired/proper/
    read1/read2."""
    recs = [
        ["a", "99", "c", "10", "60", "4M", "=", "30", "24", "ACGT", "*"],
        ["a", "147", "c", "30", "60", "4M", "=", "10", "-24", "ACGT", "*"],
        ["a", str(0x163), "c", "99", "0", "4M", "=", "30", "0", "ACGT", "*"],
    ]
    c = flagstat(recs)
    assert c["total"] == 3 and c["secondary"] == 1
    assert c["paired"] == 2 and c["proper"] == 2
    assert c["read1"] == 1 and c["read2"] == 1


def test_idxstats(tmp_path, rng, monkeypatch, capsys):
    """Per-contig rows match a hand count; '*' and unmapped-with-RNAME
    records land in the right columns; CLI output is tab-separated."""
    from tpufm.io.bam_index import idxstats

    contigs = [("c1", 1 << 16), ("c2", 1 << 15)]
    text = _mk_sam(rng, 100, contigs)
    # one placed-but-unmapped record (unmapped mate carrying RNAME)
    text += "pm\t4\tc1\t77\t0\t*\t*\t0\t0\tACGT\t*\n"
    header = "".join(l for l in text.splitlines(keepends=True)
                     if l.startswith("@"))
    recs = [l.split("\t") for l in text.splitlines()
            if l and not l.startswith("@")]
    rows = idxstats(header, recs)
    assert [r[0] for r in rows] == ["c1", "c2", "*"]
    assert rows[0][1] == 1 << 16 and rows[1][1] == 1 << 15
    n_c1 = sum(1 for f in recs if f[2] == "c1" and not int(f[1]) & 4)
    assert rows[0][2] == n_c1 and rows[0][3] == 1
    assert rows[2] == ("*", 0, 0, 4)  # the _mk_sam unmapped tail
    assert sum(r[2] + r[3] for r in rows) == len(recs)
    # CLI over a BAM
    monkeypatch.chdir(tmp_path)
    write_bam_indexed("i.bam", text)
    capsys.readouterr()
    cli.main(["idxstats", "i.bam"])
    out = capsys.readouterr().out.splitlines()
    assert out[0].split("\t")[0] == "c1" and out[-1].startswith("*\t0\t0\t")


def test_merge(tmp_path, rng, monkeypatch, capsys):
    """Merging two sorted per-shard BAMs reproduces sorting the union:
    same records, coordinate order, one deduped header, rejects inputs
    with a different contig dictionary."""
    from tpufm.io.bam import write_bam

    monkeypatch.chdir(tmp_path)
    contigs = [("cA", 1 << 17), ("cB", 1 << 16)]
    t1 = _mk_sam(rng, 150, contigs)
    t2 = _mk_sam(rng, 90, contigs)
    write_bam_indexed("s1.bam", t1)
    write_bam("u2.bam", t2)  # unsorted BAM input is fine — merge re-sorts
    capsys.readouterr()
    cli.main(["merge", "m.bam", "s1.bam", "u2.bam"])
    assert "248 records from 2 inputs" in capsys.readouterr().out
    header, recs = read_bam("m.bam")
    assert header.count("@HD") == 1 and "SO:coordinate" in header
    assert header.count("@SQ\tSN:cA") == 1  # deduped
    # records = union of both inputs, in coordinate order
    want = sorted(
        (l.split("\t") for t in (t1, t2) for l in t.splitlines()
         if l and not l.startswith("@")),
        key=lambda f: (1, 0, 0) if f[2] == "*"
        else (0, ["cA", "cB"].index(f[2]), int(f[3])),
    )
    assert [r[:4] for r in recs] == [w[:4] for w in want]
    assert (tmp_path / "m.bam.bai").exists()
    # contig-dictionary mismatch is rejected
    write_bam("other.bam", _mk_sam(rng, 5, [("cX", 1 << 16)]))
    with pytest.raises(SystemExit, match="@SQ dictionary"):
        cli.main(["merge", "n.bam", "s1.bam", "other.bam"])
    # byte-identical DUPLICATE records (same file merged twice) must all
    # survive indexed queries — dedup is by file position, not content
    cli.main(["merge", "dup.bam", "s1.bam", "s1.bam"])
    ib = IndexedBam("dup.bam")
    q = ib.query("cA", 0, 1 << 17)
    n_s1_cA = sum(1 for l in t1.splitlines()
                  if not l.startswith("@") and l.split("\t")[2] == "cA")
    assert len(q) == 2 * n_s1_cA


def test_sort_undeclared_rname_message(rng):
    text = ("@HD\tVN:1.6\n@SQ\tSN:c\tLN:100\n"
            "r0\t0\tchrX\t5\t60\t4M\t*\t0\t0\tACGT\t*\n")
    with pytest.raises(ValueError, match="@SQ"):
        sort_sam_text(text)


def _brute_depth(records, contigs):
    """Per-base counting by literally walking each CIGAR — the oracle
    for the vectorized diff-array depth()."""
    cov = {name: np.zeros(ln, np.int64) for name, ln in contigs}
    for f in records:
        if int(f[1]) & (0x4 | 0x100 | 0x200 | 0x400) or f[2] not in cov:
            continue
        p = int(f[3]) - 1
        if f[5] == "*":
            cov[f[2]][p] += 1
            continue
        for n, op in re.findall(r"(\d+)([MIDNSHP=X])", f[5]):
            n = int(n)
            if op in "M=X":
                cov[f[2]][p : p + n] += 1
                p += n
            elif op in "DN":
                p += n
    return cov


def test_depth_matches_bruteforce(rng):
    """Diff-array depth == per-base CIGAR walk, on records with D-CIGARs,
    secondary records (skipped), and an unmapped tail; row order is
    coordinate order and zero positions are omitted by default."""
    from tpufm.io.bam_index import depth

    contigs = [("c1", 5000), ("c2", 3000)]
    text = _mk_sam(rng, 400, contigs, L=24)
    # a duplicate-flagged and a qcfail record: both must be skipped
    text += ("d0\t1024\tc1\t7\t60\t24M\t*\t0\t0\t" + "ACGT" * 6 + "\t*\n"
             "q0\t512\tc1\t7\t60\t24M\t*\t0\t0\t" + "ACGT" * 6 + "\t*\n")
    header = "".join(l for l in text.splitlines(keepends=True)
                     if l.startswith("@"))
    recs = [l.split("\t") for l in text.splitlines()
            if l and not l.startswith("@")]
    cov = _brute_depth(recs, contigs)
    rows = list(depth(header, recs))
    want = [(n, p + 1, int(c[p]))
            for n, _ in contigs for c in [cov[n]] for p in np.flatnonzero(c)]
    assert rows == want
    # deletions do NOT cover: plant an isolated record with a known D
    lone = [["x", "0", "c1", "1", "60", "4M3D4M", "*", "0", "0",
             "ACGTACGT", "*"]]
    assert list(depth(header, lone)) == [
        ("c1", p, 1) for p in [1, 2, 3, 4, 8, 9, 10, 11]
    ]
    # CIGAR '*' on a mapped record aligns no bases: zero coverage,
    # matching samtools depth/pileup
    star = [["y", "0", "c1", "5", "60", "*", "*", "0", "0", "ACGT", "*"]]
    assert list(depth(header, star)) == []


def test_depth_region_and_all(rng):
    from tpufm.io.bam_index import depth

    header = "@SQ\tSN:c\tLN:40\n"
    recs = [["a", "0", "c", "11", "60", "5M", "*", "0", "0", "ACGTA", "*"]]
    # region window clips output; all_positions emits the zeros
    assert list(depth(header, recs, region=("c", 12, 14))) == [
        ("c", 13, 1), ("c", 14, 1)
    ]
    rows = list(depth(header, recs, region=("c", 8, None),
                      all_positions=True))
    assert len(rows) == 32 and rows[0] == ("c", 9, 0)
    assert [r for r in rows if r[2]] == [("c", p, 1) for p in range(11, 16)]
    # records straddling / outside the window: the windowed diff array
    # must clip them correctly (straddle keeps in-window cover, outside
    # contributes nothing)
    recs2 = recs + [
        ["b", "0", "c", "9", "60", "10M", "*", "0", "0", "A" * 10, "*"],
        ["o", "0", "c", "30", "60", "5M", "*", "0", "0", "AAAAA", "*"],
        ["p", "0", "c", "1", "60", "3M", "*", "0", "0", "AAA", "*"],
    ]
    assert list(depth(header, recs2, region=("c", 12, 14))) == [
        ("c", 13, 2), ("c", 14, 2)
    ]


def test_cli_depth(tmp_path, rng, monkeypatch, capsys):
    """CLI over SAM and over an indexed BAM (region -> index-driven
    fetch) agree with the library depth()."""
    from tpufm.io.bam_index import depth

    monkeypatch.chdir(tmp_path)
    contigs = [("cA", 1 << 16), ("cB", 1 << 15)]
    text = _mk_sam(rng, 300, contigs)
    with open("a.sam", "w") as fp:
        fp.write(text)
    write_bam_indexed("a.bam", text)
    header = "".join(l for l in text.splitlines(keepends=True)
                     if l.startswith("@"))
    recs = [l.split("\t") for l in text.splitlines()
            if l and not l.startswith("@")]
    want = [f"{n}\t{p}\t{d}" for n, p, d in depth(header, recs)]
    capsys.readouterr()
    cli.main(["depth", "a.sam"])
    assert capsys.readouterr().out.splitlines() == want
    # indexed-BAM region query == the same rows windowed (sort reorders
    # records but depth is order-free)
    beg, end = 2000, 9000
    want_w = [f"{n}\t{p}\t{d}" for n, p, d in
              depth(header, recs, region=("cA", beg - 1, end))]
    cli.main(["depth", "a.bam", f"cA:{beg}-{end}", "--output", "w.txt"])
    assert open("w.txt").read().splitlines() == want_w
    with pytest.raises(SystemExit, match="not a contig"):
        cli.main(["depth", "a.bam", "chrZ:1-10"])
    with pytest.raises(SystemExit, match="not a contig"):
        cli.main(["depth", "a.sam", "chrZ:1-10"])
    # a PREFIX of a real contig ('c' vs 'cA') must not pass the SAM-path
    # header check (it used to substring-match the raw header text)
    with pytest.raises(SystemExit, match="not a contig"):
        cli.main(["depth", "a.sam", "c:1-10"])


def test_fastq_records_orientation():
    """Minus-strand records reverse-complement back to sequencer
    orientation (QUAL reversed with them); secondary/supplementary
    records and SEQ-'*' records are skipped; '*' QUAL fills."""
    from tpufm.io.bam_index import fastq_records

    recs = [
        ["p", "0", "c", "1", "60", "4M", "*", "0", "0", "ACGT", "IJKL"],
        ["m", "16", "c", "9", "60", "4M", "*", "0", "0", "ACGT", "IJKL"],
        ["s", "256", "c", "1", "60", "4M", "*", "0", "0", "ACGT", "IJKL"],
        ["u", "2048", "c", "1", "60", "4M", "*", "0", "0", "ACGT", "IJKL"],
        ["n", "0", "c", "1", "60", "4M", "*", "0", "0", "*", "*"],
        ["q", "4", "*", "0", "0", "*", "*", "0", "0", "ACNGT", "*"],
    ]
    got = list(fastq_records(recs))
    assert got == [
        ("p", 0, "ACGT", "IJKL"),
        ("m", 16, "ACGT", "LKJI"),  # RC of RC = original; qual reversed
        ("q", 4, "ACNGT", "IIIII"),
    ]


def test_cli_fastq_roundtrip(tmp_path, rng, monkeypatch, capsys):
    """FASTQ in -> tpufm align -> tpufm fastq out: every exported read
    (both strands) is byte-identical to the sequencer original,
    including its quality string."""
    monkeypatch.chdir(tmp_path)
    n, L = 4000, 36
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    with open("g.fa", "wb") as fp:
        fp.write(b">c\n" + decode_bases(codes) + b"\n")
    from tpufm.utils.encoding import reverse_complement

    reads, quals = {}, {}
    with open("r.fastq", "wb") as fp:
        for i, s in enumerate([100, 700, 2200, 3300]):
            sub = codes[s : s + L]
            if i % 2:  # minus strand: sequencer read = RC of reference
                sub = reverse_complement(sub)
            q = "".join(chr(33 + int(x)) for x in rng.integers(0, 40, L))
            reads[f"p{i}"], quals[f"p{i}"] = decode_bases(sub).decode(), q
            fp.write(b"@p%d\n%s\n+\n%s\n"
                     % (i, reads[f"p{i}"].encode(), q.encode()))
    cli.main(["align", "g.fa", "r.fastq", "-o", "o.sam",
              "--sample-rate", "8"])
    capsys.readouterr()
    cli.main(["fastq", "o.sam", "--output", "back.fastq"])
    lines = open("back.fastq").read().splitlines()
    got = {lines[i][1:]: (lines[i + 1], lines[i + 3])
           for i in range(0, len(lines), 4)}
    assert set(got) == set(reads)
    for name in reads:
        assert got[name] == (reads[name], quals[name]), name


def test_cli_fastq_paired_routing(tmp_path, monkeypatch, capsys):
    """-1/-2 route mates to two files in order; without them mates get
    /1 //2 suffixes in one stream; -1 without -2 is rejected."""
    monkeypatch.chdir(tmp_path)
    sam = ("@HD\tVN:1.6\n@SQ\tSN:c\tLN:1000\n"
           "a\t99\tc\t10\t60\t4M\t=\t30\t24\tACGT\tIIII\n"
           "a\t147\tc\t30\t60\t4M\t=\t10\t-24\tTTTT\tJJJJ\n"
           "b\t0\tc\t50\t60\t4M\t*\t0\t0\tGGGG\tKKKK\n")
    open("x.sam", "w").write(sam)
    cli.main(["fastq", "x.sam", "-1", "r1.fq", "-2", "r2.fq",
              "--output", "un.fq"])
    assert open("r1.fq").read() == "@a\nACGT\n+\nIIII\n"
    # 147 = paired+reverse+read2: RC back to sequencer orientation
    assert open("r2.fq").read() == "@a\nAAAA\n+\nJJJJ\n"
    assert open("un.fq").read() == "@b\nGGGG\n+\nKKKK\n"
    capsys.readouterr()
    cli.main(["fastq", "x.sam", "--output", "all.fq"])
    names = [l for l in open("all.fq").read().splitlines()
             if l.startswith("@")]
    assert names == ["@a/1", "@a/2", "@b"]
    # -1 without -2 must be rejected BEFORE any output file is opened:
    # an existing file named by -1 (or --output) survives untouched
    open("only1.fq", "w").write("precious\n")
    open("out.fq", "w").write("also precious\n")
    with pytest.raises(SystemExit, match="together"):
        cli.main(["fastq", "x.sam", "-1", "only1.fq", "--output", "out.fq"])
    assert open("only1.fq").read() == "precious\n"
    assert open("out.fq").read() == "also precious\n"


def test_bgzf_level_knob(monkeypatch):
    from tpufm.io.bam import bgzf_compress, bgzf_decompress

    data = bytes(range(256)) * 2000
    fast = bgzf_compress(data, level=1)
    slow = bgzf_compress(data, level=9)
    assert bgzf_decompress(fast) == data == bgzf_decompress(slow)
    monkeypatch.setenv("TPUFM_BGZF_LEVEL", "1")
    assert bgzf_compress(data) == fast
    for bad in ("fast", "99", "-2"):
        monkeypatch.setenv("TPUFM_BGZF_LEVEL", bad)
        with pytest.raises(ValueError, match="TPUFM_BGZF_LEVEL"):
            bgzf_compress(data)


def test_sam_stats_counters():
    """sam_stats over a hand-built SAM with known NM/CIGAR/TLEN/QUAL:
    every SN value, the RL histogram, and the insert stats are exact."""
    from tpufm.io.bam_index import sam_stats

    recs = [
        # proper pair, insert 100, NM=1, Q=30 everywhere ('?'), 10M
        ["a", "99", "c", "10", "60", "10M", "=", "100", "100",
         "A" * 10, "?" * 10, "NM:i:1"],
        ["a", "147", "c", "100", "60", "10M", "=", "10", "-100",
         "A" * 10, "?" * 10, "NM:i:0"],
        # proper pair, insert 200, one mate soft-clipped (8 aligned)
        ["b", "99", "c", "20", "60", "8M2S", "=", "210", "200",
         "C" * 10, "?" * 10, "NM:i:2"],
        ["b", "147", "c", "210", "60", "10M", "=", "20", "-200",
         "C" * 10, "?" * 10, "NM:i:0"],
        # unpaired mapped, MQ0, no NM tag, 6M (shorter read)
        ["u", "0", "c", "50", "0", "6M", "*", "0", "0", "G" * 6, "?" * 6],
        # unmapped, duplicate-flagged
        ["x", "1029", "*", "0", "0", "*", "*", "0", "0", "T" * 10, "*"],
        # secondary + supplementary: excluded from sequence counters
        ["s", "256", "c", "9", "60", "10M", "*", "0", "0", "*", "*"],
        ["p", "2048", "c", "9", "60", "5M", "*", "0", "0", "A" * 5, "*"],
    ]
    s = sam_stats(recs)
    sn = dict(s["sn"])
    assert sn["raw total sequences"] == 6
    assert sn["reads mapped"] == 5
    assert sn["reads unmapped"] == 1
    assert sn["reads paired"] == 5  # 4 mates + the paired unmapped dup
    assert sn["reads properly paired"] == 4
    assert sn["reads mapped and paired"] == 4
    assert sn["reads duplicated"] == 1
    assert sn["reads MQ0"] == 1
    assert sn["non-primary alignments"] == 1
    assert sn["supplementary alignments"] == 1
    assert sn["total length"] == 56
    assert sn["bases mapped (cigar)"] == 10 + 10 + 8 + 10 + 6
    assert sn["mismatches"] == 3
    # error rate over NM-carrying records only: 3 / (10+10+8+10)
    assert sn["error rate"] == round(3 / 38, 6)
    assert sn["average length"] == round(56 / 6, 1)
    assert sn["maximum length"] == 10
    assert sn["average quality"] == 30.0
    assert sn["insert size average"] == 150.0
    assert sn["insert size standard deviation"] == 50.0
    assert s["rl"] == {6: 1, 10: 5}
    assert s["is"] == {100: 1, 200: 1}


def test_cli_stats(tmp_path, rng, monkeypatch, capsys):
    """CLI over SAM and BAM produce identical SN/RL/IS lines."""
    monkeypatch.chdir(tmp_path)
    contigs = [("cA", 1 << 15)]
    text = _mk_sam(rng, 200, contigs)
    open("a.sam", "w").write(text)
    write_bam_indexed("a.bam", text)
    capsys.readouterr()
    cli.main(["stats", "a.sam"])
    out_sam = capsys.readouterr().out
    assert "SN\traw total sequences:" in out_sam
    cli.main(["stats", "a.bam", "--output", "b.txt"])
    # BAM decode round trip preserves every counter
    assert open("b.txt").read() == out_sam


def test_bedcov_matches_depth_sum(tmp_path, rng, monkeypatch, capsys):
    """bedcov == sum of depth() over each region, via both the indexed
    BAM path and the SAM full-scan path; bad BED and unknown contigs
    error cleanly."""
    from tpufm.io.bam_index import bedcov, depth, read_bed

    monkeypatch.chdir(tmp_path)
    contigs = [("cA", 1 << 16), ("cB", 1 << 15)]
    text = _mk_sam(rng, 300, contigs)
    open("a.sam", "w").write(text)
    write_bam_indexed("a.bam", text)
    header = "".join(l for l in text.splitlines(keepends=True)
                     if l.startswith("@"))
    recs = [l.split("\t") for l in text.splitlines()
            if l and not l.startswith("@")]
    regions = [("cA", 100, 5000), ("cA", 0, 1 << 16), ("cB", 4000, 4001),
               ("cB", 30000, 32000)]
    open("r.bed", "w").write(
        "track name=x\nbrowser position cA:1-100\n# comment\n"
        + "".join(f"{c}\t{b}\t{e}\textra\n" for c, b, e in regions))
    assert [(c, b, e) for c, b, e, _ in read_bed("r.bed")] == regions
    # a contig literally named track_1 is DATA, not a directive
    open("t.bed", "w").write("track_1\t0\t10\n")
    assert read_bed("t.bed")[0][:3] == ("track_1", 0, 10)
    want = [
        (c, b, e, sum(d for _, _, d in depth(header, recs, region=(c, b, e))))
        for c, b, e in regions
    ]
    got = list(bedcov(header, lambda c, b, e: recs, regions))
    assert got == want
    # CLI echoes every original BED column and appends the sum
    want_lines = [f"{c}\t{b}\t{e}\textra\t{t}" for c, b, e, t in want]
    capsys.readouterr()
    cli.main(["bedcov", "a.sam", "r.bed"])
    assert capsys.readouterr().out.splitlines() == want_lines
    cli.main(["bedcov", "a.bam", "r.bed", "--output", "o.txt"])
    assert open("o.txt").read().splitlines() == want_lines
    open("bad.bed", "w").write("cA\t5\n")
    with pytest.raises(SystemExit, match="BED needs"):
        cli.main(["bedcov", "a.sam", "bad.bed"])
    open("bad2.bed", "w").write("cA\tx\t9\n")
    with pytest.raises(SystemExit, match="BED needs"):
        cli.main(["bedcov", "a.sam", "bad2.bed"])
    open("zz.bed", "w").write("chrZ\t0\t10\n")
    for inp in ("a.sam", "a.bam"):
        with pytest.raises(SystemExit, match="not a contig"):
            cli.main(["bedcov", inp, "zz.bed"])


def test_unclipped_5p():
    from tpufm.io.bam_index import _unclipped_5p

    # forward: leading clips subtract from POS
    assert _unclipped_5p(100, "10M", False) == 100
    assert _unclipped_5p(100, "5S10M", False) == 95
    assert _unclipped_5p(100, "3H2S10M", False) == 95
    # reverse: 5' end is the reference end plus trailing clips
    assert _unclipped_5p(100, "10M", True) == 109
    assert _unclipped_5p(100, "10M4S", True) == 113
    assert _unclipped_5p(100, "2S6M2D4M3S2H", True) == 100 + 12 - 1 + 5
    # deletions consume reference, insertions do not
    assert _unclipped_5p(50, "5M2I5M", True) == 59


def test_markdup_semantics():
    """Planted duplicate groups: clipped duplicates share a key, the
    best-QUAL record survives, pairs mark as templates, secondary /
    unmapped records pass through untouched."""
    from tpufm.io.bam_index import markdup

    recs = [
        # single-end group: same unclipped 5' (95) despite clipping;
        # r1 has higher QUAL sum and must survive
        ["r1", "0", "c", "96", "60", "10M", "*", "0", "0", "A" * 10, "I" * 10],
        ["r2", "0", "c", "101", "60", "5S5M", "*", "0", "0", "A" * 10, "#" * 10],
        # reverse read at a different 5': NOT in the group
        ["r3", "16", "c", "96", "60", "10M", "*", "0", "0", "A" * 10, "I" * 10],
        # paired template duplicated: both mates of the 2nd pair mark
        ["p1", "99", "c", "10", "60", "10M", "=", "60", "60", "C" * 10, "I" * 10],
        ["p1", "147", "c", "60", "60", "10M", "=", "10", "-60", "C" * 10, "I" * 10],
        ["p2", "99", "c", "10", "60", "10M", "=", "60", "60", "C" * 10, "#" * 10],
        ["p2", "147", "c", "60", "60", "10M", "=", "10", "-60", "C" * 10, "#" * 10],
        # secondary and unmapped: never marked, never group
        ["r1", "256", "c", "96", "60", "10M", "*", "0", "0", "*", "*"],
        ["u1", "4", "*", "0", "0", "*", "*", "0", "0", "T" * 5, "*"],
    ]
    out, n = markdup(recs)
    flags = [int(f[1]) for f in out]
    assert n == 3
    assert not flags[0] & 0x400 and flags[1] & 0x400  # best QUAL survives
    assert not flags[2] & 0x400
    assert not flags[3] & 0x400 and not flags[4] & 0x400
    assert flags[5] & 0x400 and flags[6] & 0x400  # whole template marks
    assert flags[7] == 256 and flags[8] == 4  # untouched
    # marked duplicates disappear from depth/flagstat/stats automatically
    from tpufm.io.bam_index import depth, sam_stats

    header = "@SQ\tSN:c\tLN:1000\n"
    base = [r for r in out if not int(r[1]) & 0x400 and r[2] != "*"
            and not int(r[1]) & 0x100]
    assert list(depth(header, out)) == list(depth(header, base))
    assert dict(sam_stats(iter(out))["sn"])["reads duplicated"] == 3


def test_markdup_template_level():
    """Duplicate pairs mark as WHOLE templates: the survivor is the pair
    with the best combined QUAL — never a per-mate mix — and a duplicate
    whose mate copy is soft-clipped (different PNEXT) still collides via
    the mates' own unclipped-5' keys."""
    from tpufm.io.bam_index import markdup

    # p1: r1 QUAL high / r2 low; p2: r1 low / r2 high. Combined sums are
    # equal-ish but p1 wins (I=40 vs 5 gives p1 400+50, p2 50+400: tie ->
    # earliest template wins); both p2 mates must mark TOGETHER.
    recs = [
        ["p1", "99", "c", "10", "60", "10M", "=", "200", "200", "A" * 10, "I" * 10],
        ["p1", "147", "c", "200", "60", "10M", "=", "10", "-200", "A" * 10, "#" * 10],
        ["p2", "99", "c", "10", "60", "10M", "=", "200", "200", "A" * 10, "#" * 10],
        ["p2", "147", "c", "200", "60", "10M", "=", "10", "-200", "A" * 10, "I" * 10],
    ]
    out, n = markdup(recs)
    flags = [int(f[1]) for f in out]
    assert n == 2
    assert not flags[0] & 0x400 and not flags[1] & 0x400
    assert flags[2] & 0x400 and flags[3] & 0x400
    # clipped-mate duplicate: U's read2 lost 2 bases at its 3' end (the
    # reference-left edge of a reverse read), so its POS is 202 and the
    # read1 copies carry DIFFERENT PNEXTs — but the unclipped 5' (right
    # edge, 208) matches T's read2, so the template must still fully mark
    recs2 = [
        ["T", "99", "c", "100", "60", "10M", "=", "200", "110", "C" * 10, "I" * 10],
        ["T", "147", "c", "200", "60", "10M", "=", "100", "-110", "C" * 10, "I" * 10],
        ["U", "99", "c", "100", "60", "10M", "=", "202", "110", "C" * 10, "#" * 10],
        ["U", "147", "c", "202", "60", "2S8M", "=", "100", "-110", "C" * 10, "#" * 10],
    ]
    out2, n2 = markdup(recs2)
    flags2 = [int(f[1]) for f in out2]
    assert n2 == 2
    assert not flags2[0] & 0x400 and not flags2[1] & 0x400
    assert flags2[2] & 0x400 and flags2[3] & 0x400


def test_sam_stats_singleton_not_mapped_and_paired():
    """A mapped read whose mate is unmapped (flag 0x8) is a singleton:
    samtools stats does NOT count it in 'reads mapped and paired'."""
    from tpufm.io.bam_index import sam_stats

    recs = [["s", "73", "c", "10", "60", "5M", "=", "10", "0",
             "ACGTA", "IIIII"]]
    sn = dict(sam_stats(recs)["sn"])
    assert sn["reads mapped"] == 1
    assert sn["reads mapped and paired"] == 0


def test_cli_markdup(tmp_path, rng, monkeypatch, capsys):
    """CLI round trip: duplicate a few records of a synthetic SAM, mark,
    and check the marked BAM's flagstat-visible duplicate count."""
    monkeypatch.chdir(tmp_path)
    text = _mk_sam(rng, 100, [("c", 1 << 16)])
    lines = text.splitlines()
    body = [l for l in lines if not l.startswith("@")]
    # duplicate 5 primary mapped records verbatim (worse name, same QUAL)
    dups = [l for l in body if not int(l.split("\t")[1]) & (0x100 | 0x4)][:5]
    open("a.sam", "w").write(
        "\n".join([l for l in lines if l.startswith("@")] + body + dups) + "\n")
    capsys.readouterr()
    cli.main(["markdup", "a.sam", "--output", "m.bam"])
    assert "5 duplicates marked" in capsys.readouterr().out
    from tpufm.io.bam import read_bam

    _, recs = read_bam("m.bam")
    assert sum(bool(int(f[1]) & 0x400) for f in recs) == 5
    # SAM output path
    cli.main(["markdup", "a.sam", "--output", "m.sam"])
    marked = [l for l in open("m.sam").read().splitlines()
              if not l.startswith("@")]
    assert sum(bool(int(l.split("\t")[1]) & 0x400) for l in marked) == 5


def test_markdup_random_differential(rng):
    """Randomized templates with planted duplicate copies (random
    clipping, shuffled order): markdup must mark exactly the records a
    brute-force independent oracle marks — same unclipped-5' math, same
    template-level best-combined-QUAL rule — and never flag a record of
    a unique template."""
    from tpufm.io.bam_index import _unclipped_5p, markdup

    def mk_pair(qname, p1, p2, q1, q2, clip2=0):
        """FR pair: fwd 20M at p1, rev at p2 (3'-clipped by clip2 with
        POS shifted so the unclipped 5' stays p2+19)."""
        c2 = f"{clip2}S{20 - clip2}M" if clip2 else "20M"
        return [
            [qname, "99", "c", str(p1 + 1), "60", "20M", "=",
             str(p2 + clip2 + 1), "60", "A" * 20, chr(33 + q1) * 20],
            [qname, "147", "c", str(p2 + clip2 + 1), "60", c2, "=",
             str(p1 + 1), "-60", "A" * 20, chr(33 + q2) * 20],
        ]

    recs = []
    truth_groups = []  # lists of template qnames sharing a coordinate key
    for g in range(12):
        p1 = int(rng.integers(0, 5000))
        p2 = p1 + 40
        n_copies = int(rng.integers(1, 4))
        quals = [(int(rng.integers(5, 40)), int(rng.integers(5, 40)))
                 for _ in range(n_copies)]
        names = []
        for c, (q1, q2) in enumerate(quals):
            name = f"g{g}c{c}"
            names.append((name, q1 + q2))
            recs += mk_pair(name, p1, p2, q1, q2,
                            clip2=int(rng.integers(0, 3)))
        truth_groups.append(names)
    order = rng.permutation(len(recs))
    recs = [recs[i] for i in order]

    out, n = markdup(recs)
    # oracle: per coordinate group, survivors = the max-combined-QUAL
    # template (earliest in RECORD order on ties — mirror the rule)
    first_idx = {}
    for i, f in enumerate(recs):
        first_idx.setdefault(f[0], i)
    marked_names = set()
    expect_marked = 0
    for names in truth_groups:
        if len(names) < 2:
            continue
        best = max(names, key=lambda nq: (nq[1], -first_idx[nq[0]]))
        for name, _ in names:
            if name != best[0]:
                marked_names.add(name)
                expect_marked += 2
    assert n == expect_marked
    for f in out:
        assert bool(int(f[1]) & 0x400) == (f[0] in marked_names), f
    # sanity on the clip math the generator relied on
    assert _unclipped_5p(100 + 2, "2S18M", True) == 100 + 20 - 1

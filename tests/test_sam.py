"""SAM v1.6 output (`locate --sam`) — tpufm extension.

No samtools in the image, so every record is validated by a strict
in-test parser: header @SQ lengths, mandatory field count and types,
FLAG semantics (strand, secondary, pair bits), 1-based POS against the
planted truth, SEQ orientation (FLAG 0x10 records carry the reverse
complement of the sequenced read), NM, and paired RNEXT/PNEXT/TLEN
cross-references."""

import numpy as np
import pytest

from tpufm import cli
from tpufm.utils.encoding import decode_bases, encode_bases, reverse_complement


def _parse(path):
    header, records = [], []
    for line in open(path).read().splitlines():
        if line.startswith("@"):
            header.append(line)
            continue
        f = line.split("\t")
        assert len(f) >= 11, line
        records.append({
            "qname": f[0], "flag": int(f[1]), "rname": f[2],
            "pos": int(f[3]), "mapq": int(f[4]), "cigar": f[5],
            "rnext": f[6], "pnext": int(f[7]), "tlen": int(f[8]),
            "seq": f[9], "qual": f[10], "tags": f[11:],
        })
    return header, records


def _write_two_contig_ref(codes, path):
    with open(path, "wb") as fp:
        fp.write(b">cA\n" + decode_bases(codes[:2600]) + b"\n")
        fp.write(b">cB\n" + decode_bases(codes[2600:]) + b"\n")


def test_sam_single_end(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    n, L = 5000, 24
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    _write_two_contig_ref(codes, "g.fa")
    # reads: plus-strand planted, minus-strand planted, random (unmapped),
    # and a boundary-spanning planted read (dropped from SAM -> unmapped)
    sp = int(rng.integers(0, 2600 - L))
    sm = int(rng.integers(2600, n - L))
    reads = np.stack([
        codes[sp : sp + L],
        reverse_complement(codes[sm : sm + L][None])[0],
        rng.integers(0, 4, size=L, dtype=np.uint8),
        codes[2590 : 2590 + L],  # spans cA|cB
    ])
    with open("q.qry", "wb") as fp:
        for i in range(4):
            fp.write(b"> x%d\n%s\n" % (i, decode_bases(reads[i])))
    cli.main(["locate", "g.fa", str(n), "q.qry", str(L), "4",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--sam", "--output", "o.sam"])
    header, recs = _parse("o.sam")
    assert "@HD\tVN:1.6\tSO:unknown" in header
    assert "@SQ\tSN:cA\tLN:2600" in header
    assert f"@SQ\tSN:cB\tLN:{n - 2600}" in header
    by = {}
    for r in recs:
        by.setdefault(r["qname"], []).append(r)

    r0 = by["x0"][0]  # plus strand
    assert r0["flag"] == 0 and r0["rname"] == "cA" and r0["pos"] == sp + 1
    assert r0["mapq"] == 60  # unique best site
    assert r0["cigar"] == f"{L}M" and "NM:i:0" in r0["tags"]
    np.testing.assert_array_equal(
        encode_bases(r0["seq"].encode()), codes[sp : sp + L]
    )
    r1 = by["x1"][0]  # minus strand: SEQ is forward-reference orientation
    assert r1["flag"] == 16 and r1["rname"] == "cB"
    assert r1["pos"] == sm - 2600 + 1
    np.testing.assert_array_equal(
        encode_bases(r1["seq"].encode()), codes[sm : sm + L]
    )
    # the original sequenced read is the rc of SEQ
    np.testing.assert_array_equal(
        reverse_complement(encode_bases(r1["seq"].encode())[None])[0],
        reads[1],
    )
    assert by["x2"][0]["flag"] == 4 and by["x2"][0]["rname"] == "*"
    # the spanning hit is dropped -> unmapped record
    assert by["x3"][0]["flag"] == 4


def test_sam_secondary_records(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    L = 20
    unit = rng.integers(0, 4, size=500, dtype=np.uint8)
    codes = np.concatenate([unit, unit])  # every read occurs twice
    with open("g.fa", "wb") as fp:
        fp.write(b">c\n" + decode_bases(codes) + b"\n")
    s0 = 37
    with open("q.qry", "wb") as fp:
        fp.write(b"> a\n%s\n" % decode_bases(codes[s0 : s0 + L]))
    cli.main(["locate", "g.fa", "1000", "q.qry", str(L), "1",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--max-hits", "4", "--sam", "--output", "o.sam"])
    _, recs = _parse("o.sam")
    assert len(recs) == 2
    assert recs[0]["flag"] & 0x100 == 0
    assert recs[1]["flag"] & 0x100
    assert {r["pos"] for r in recs} == {s0 + 1, s0 + 500 + 1}
    # tied-best multi-mapper: MAPQ 0 on every record
    assert all(r["mapq"] == 0 for r in recs)


def test_sam_paired(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    n, L, imin, imax, B = 6000, 24, 150, 400, 12
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    with open("g.fa", "wb") as fp:
        fp.write(b">chr1\n" + decode_bases(codes) + b"\n")
    cli.main(["genreads", "g.fa", str(n), str(L), str(B), "--paired",
              "--insert-min", str(imin), "--insert-max", str(imax),
              "--seed", "4", "--output", "pp"])
    cli.main(["locate", "g.fa", str(n), "pp_1.qry", str(L), str(B),
              "--k", "3", "--d", "64", "--sample-rate", "8",
              "--paired", "pp_2.qry", "--insert-min", str(imin),
              "--insert-max", str(imax), "--sam", "--output", "o.sam"])
    from tpufm.io.genreads import generate_read_pairs

    _, _, (ls, rs, minus) = generate_read_pairs(
        codes, L, B, imin, imax, seed=4, return_truth=True
    )
    _, recs = _parse("o.sam")
    by = {}
    for r in recs:
        by.setdefault(r["qname"], []).append(r)
    for i in range(B):
        rr = [r for r in by[f"rid{i}"] if not r["flag"] & 0x100]
        assert len(rr) == 2
        first = next(r for r in rr if r["flag"] & 0x40)
        second = next(r for r in rr if r["flag"] & 0x80)
        frag = int(rs[i]) + L - int(ls[i])
        for r in rr:
            assert r["flag"] & 0x1 and r["flag"] & 0x2
            assert r["rname"] == "chr1" and r["rnext"] == "="
            assert abs(r["tlen"]) == frag
        assert first["tlen"] == -second["tlen"]
        # mate coordinates cross-reference
        assert first["pnext"] == second["pos"]
        assert second["pnext"] == first["pos"]
        if minus[i]:
            # R1 reversed (rightmost), R2 forward (leftmost)
            assert first["flag"] & 0x10 and second["flag"] & 0x20
            assert first["pos"] == rs[i] + 1 and second["pos"] == ls[i] + 1
            assert first["tlen"] == -frag
        else:
            assert first["flag"] & 0x20 and second["flag"] & 0x10
            assert first["pos"] == ls[i] + 1 and second["pos"] == rs[i] + 1
            assert first["tlen"] == frag
        # SEQ is always forward-reference orientation
        np.testing.assert_array_equal(
            encode_bases(first["seq"].encode()),
            codes[first["pos"] - 1 : first["pos"] - 1 + L],
        )
        np.testing.assert_array_equal(
            encode_bases(second["seq"].encode()),
            codes[second["pos"] - 1 : second["pos"] - 1 + L],
        )


def test_sam_unpaired_pair_and_guards(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    n, L = 3000, 20
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    with open("g.fa", "wb") as fp:
        fp.write(b">c\n" + decode_bases(codes) + b"\n")
    rnd = rng.integers(0, 4, size=(1, L), dtype=np.uint8)
    for name in ("a.qry", "b.qry"):
        with open(name, "wb") as fp:
            fp.write(b"> z\n%s\n" % decode_bases(rnd[0]))
    cli.main(["locate", "g.fa", str(n), "a.qry", str(L), "1",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--paired", "b.qry", "--sam", "--output", "o.sam"])
    _, recs = _parse("o.sam")
    assert [r["flag"] for r in recs] == [77, 141]
    with pytest.raises(SystemExit, match="both strands"):
        cli.main(["locate", "g.fa", str(n), "a.qry", str(L), "1",
                  "--k", "2", "--d", "64", "--sample-rate", "8",
                  "--sam", "--rc"])


def test_sam_mesh_matches_single(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    n, L = 4000, 24
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    _write_two_contig_ref(codes, "g.fa")
    cli.main(["genreads", "g.fa", str(n), str(L), "16", "--seed", "2"])
    qry = f"Q-16_B-{L}_R-{n}.qry"
    common = ["locate", "g.fa", str(n), qry, str(L), "16",
              "--k", "2", "--d", "64", "--sample-rate", "8", "--sam"]
    cli.main([*common, "--output", "a.sam"])
    cli.main([*common, "--mesh", "8", "--output", "m.sam"])
    assert open("m.sam").read() == open("a.sam").read()


def test_sam_hamming_nm(tmp_path, rng, monkeypatch):
    """--sam --mismatches M: Hamming sites are pure <L>M CIGARs with the
    per-site NM:i distance; planted errors recover their origin on both
    strands with the right NM."""
    monkeypatch.chdir(tmp_path)
    n, L = 4000, 30
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    with open("g.fa", "wb") as fp:
        fp.write(b">c\n" + decode_bases(codes) + b"\n")
    sp = int(rng.integers(0, n // 2))
    sm = int(rng.integers(n // 2, n - L))
    plus = codes[sp : sp + L].copy()
    plus[7] = (plus[7] + 1) & 3  # one error
    minus = codes[sm : sm + L].copy()
    for p in (3, 19):            # two errors
        minus[p] = (minus[p] + 2) & 3
    reads = np.stack([plus, reverse_complement(minus[None])[0]])
    with open("q.qry", "wb") as fp:
        for i in range(2):
            fp.write(b"> e%d\n%s\n" % (i, decode_bases(reads[i])))
    for m in (1, 2):
        cli.main(["locate", "g.fa", str(n), "q.qry", str(L), "2",
                  "--k", "2", "--d", "64", "--sample-rate", "8",
                  "--mismatches", str(m), "--sam",
                  "--output", f"m{m}.sam"])
    _, r1 = _parse("m1.sam")
    by1 = {r["qname"]: r for r in r1 if not r["flag"] & 0x100}
    assert by1["e0"]["pos"] == sp + 1 and by1["e0"]["flag"] == 0
    assert "NM:i:1" in by1["e0"]["tags"]
    assert by1["e1"]["flag"] == 4  # two errors: not found at m=1
    _, r2 = _parse("m2.sam")
    by2 = {r["qname"]: r for r in r2 if not r["flag"] & 0x100}
    assert by2["e0"]["pos"] == sp + 1 and "NM:i:1" in by2["e0"]["tags"]
    assert by2["e1"]["pos"] == sm + 1 and by2["e1"]["flag"] == 16
    assert "NM:i:2" in by2["e1"]["tags"]
    assert by2["e1"]["cigar"] == f"{L}M"
    # SEQ of the minus record equals the reference window (fwd orientation)
    np.testing.assert_array_equal(
        encode_bases(by2["e1"]["seq"].encode())[[3, 19]] !=
        codes[sm : sm + L][[3, 19]],
        [True, True],
    )


def test_load_query_names_aligns_with_reads(tmp_path, rng):
    """names[i] must label reads[i] even for multi-line FASTA records and
    FASTQ records with empty sequences (load_queries' iteration rules)."""
    from tpufm.io.fasta import load_queries, load_query_names

    p = tmp_path / "multi.qry"
    p.write_bytes(b">setA\nACGT\nTTTT\n>setB\nGGGG\n")
    reads = load_queries(str(p), 4)
    names = load_query_names(str(p))
    assert reads.shape[0] == 3
    assert names == ["setA", "setA", "setB"]

    q = tmp_path / "x.fastq"
    q.write_bytes(b"@one\nACGT\n+\nIIII\n@empty\n\n+\n\n@two\nTTTT\n+\nIIII\n")
    reads = load_queries(str(q), 4)
    names = load_query_names(str(q))
    assert reads.shape[0] == 2
    assert names == ["one", "two"]


def test_sam_best_site_is_primary(tmp_path, rng, monkeypatch):
    """--sam --mismatches: the primary record is the lowest-NM site even
    when a worse forward-strand site enumerates first."""
    monkeypatch.chdir(tmp_path)
    n, L = 3000, 24
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    with open("g.fa", "wb") as fp:
        fp.write(b">c\n" + decode_bases(codes) + b"\n")
    # read = exact rc of a window (NM 0 on minus strand); plant a 1-error
    # plus-strand copy EARLIER in the text so it enumerates first
    sm = 2000
    read = reverse_complement(codes[sm : sm + L][None])[0]
    codes2 = codes.copy()
    codes2[100 : 100 + L] = read
    codes2[110] = (codes2[110] + 1) & 3  # 1 error in the plus-strand copy
    with open("g.fa", "wb") as fp:
        fp.write(b">c\n" + decode_bases(codes2) + b"\n")
    with open("q.qry", "wb") as fp:
        fp.write(b"> b\n%s\n" % decode_bases(read))
    cli.main(["locate", "g.fa", str(n), "q.qry", str(L), "1",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--mismatches", "1", "--sam", "--output", "o.sam"])
    _, recs = _parse("o.sam")
    primary = [r for r in recs if not r["flag"] & 0x100]
    assert len(primary) == 1
    # the exact minus-strand site must be primary despite enumeration order
    assert primary[0]["flag"] & 0x10 and "NM:i:0" in primary[0]["tags"]


def test_sam_negative_mismatches_rejected(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    codes = rng.integers(0, 4, size=1000, dtype=np.uint8)
    with open("g.fa", "wb") as fp:
        fp.write(b">c\n" + decode_bases(codes) + b"\n")
    with open("q.qry", "wb") as fp:
        fp.write(b"> z\n%s\n" % decode_bases(codes[:20]))
    with pytest.raises(SystemExit, match=">= 0"):
        cli.main(["locate", "g.fa", "1000", "q.qry", "20", "1",
                  "--k", "2", "--d", "64", "--sample-rate", "8",
                  "--sam", "--mismatches", "-1"])


def _cigar_walk(cigar):
    """(read bases consumed, ref bases consumed, edit ops) from a CIGAR."""
    import re

    rd = rf = ops = 0
    for n, sym in re.findall(r"(\d+)([MID])", cigar):
        n = int(n)
        if sym == "M":
            rd += n
            rf += n
        elif sym == "I":
            rd += n
            ops += n
        else:
            rf += n
            ops += n
    return rd, rf, ops


def test_sam_edit_cigars(tmp_path, rng, monkeypatch):
    """--sam --edits E: records carry REAL M/I/D CIGARs from the host
    re-alignment; a planted deletion shows D, an insertion shows I, CIGAR
    read-lengths always equal L, and NM:i matches the planted distance."""
    monkeypatch.chdir(tmp_path)
    n, L, E = 4000, 30, 1
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    with open("g.fa", "wb") as fp:
        fp.write(b">c\n" + decode_bases(codes) + b"\n")
    sd, si, sm = 500, 1500, 2500
    r_del = np.concatenate([codes[sd : sd + 9], codes[sd + 10 : sd + L + 1]])
    r_ins = np.concatenate(
        [codes[si : si + 12], [(codes[si + 12] + 1) & 3], codes[si + 12 : si + L - 1]]
    ).astype(np.uint8)
    r_min = reverse_complement(codes[sm : sm + L][None])[0]  # exact, minus
    reads = np.stack([r_del[:L], r_ins[:L], r_min])
    with open("q.qry", "wb") as fp:
        for i in range(3):
            fp.write(b"> d%d\n%s\n" % (i, decode_bases(reads[i])))
    cli.main(["locate", "g.fa", str(n), "q.qry", str(L), "3",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--edits", str(E), "--sam", "--output", "o.sam"])
    _, recs = _parse("o.sam")
    by = {}
    for r in recs:
        by.setdefault(r["qname"], []).append(r)
    d0 = by["d0"][0]
    assert "D" in d0["cigar"] and "NM:i:1" in d0["tags"]
    d1 = by["d1"][0]
    assert "I" in d1["cigar"] and "NM:i:1" in d1["tags"]
    d2 = by["d2"][0]
    assert d2["flag"] & 0x10 and d2["cigar"] == f"{L}M"
    assert "NM:i:0" in d2["tags"] and d2["pos"] == sm + 1
    for r in recs:
        rd, rf, ops = _cigar_walk(r["cigar"])
        assert rd == L, r
        # NM equals substitutions + indel bases; indel part bounded by ops
        nmv = int(next(t for t in r["tags"] if t.startswith("NM:i:"))[5:])
        assert ops <= nmv <= E


def test_sam_paired_hamming_nm(tmp_path, rng, monkeypatch):
    """--sam --paired --mismatches M: proper-pair records carry each
    mate's own Hamming NM:i; both FR orientations; the lowest combined-NM
    pair is primary."""
    monkeypatch.chdir(tmp_path)
    n, L = 6000, 24
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    with open("g.fa", "wb") as fp:
        fp.write(b">c\n" + decode_bases(codes) + b"\n")
    # pair 0 (strand 0): R1 fwd at l0 with 1 sub, rc(R2) at r0 with 2 subs
    l0, r0 = 700, 1000
    m1 = codes[l0 : l0 + L].copy()
    m1[5] = (m1[5] + 1) & 3
    w0 = codes[r0 : r0 + L].copy()
    w0[2] = (w0[2] + 1) & 3
    w0[17] = (w0[17] + 2) & 3
    m2 = reverse_complement(w0[None])[0]
    # pair 1 (strand 1): R2 fwd at l1 exact, rc(R1) at r1 with 1 sub
    l1, r1 = 3000, 3200
    p2 = codes[l1 : l1 + L].copy()
    w1 = codes[r1 : r1 + L].copy()
    w1[9] = (w1[9] + 3) & 3
    p1 = reverse_complement(w1[None])[0]
    with open("a.qry", "wb") as fp:
        fp.write(b"> p0\n%s\n> p1\n%s\n"
                 % (decode_bases(m1), decode_bases(p1)))
    with open("b.qry", "wb") as fp:
        fp.write(b"> p0\n%s\n> p1\n%s\n"
                 % (decode_bases(m2), decode_bases(p2)))
    cli.main(["locate", "g.fa", str(n), "a.qry", str(L), "2",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--paired", "b.qry", "--insert-min", "200",
              "--insert-max", "400", "--mismatches", "2", "--sam",
              "--output", "o.sam"])
    _, recs = _parse("o.sam")
    by = {}
    for r in recs:
        by.setdefault(r["qname"], []).append(r)
    # pair 0: R1 leftmost forward (0x63), R2 reversed rightmost (0x93)
    first = next(r for r in by["p0"] if r["flag"] & 0x40)
    second = next(r for r in by["p0"] if r["flag"] & 0x80)
    assert first["flag"] == 0x63 and first["pos"] == l0 + 1
    assert "NM:i:1" in first["tags"] and first["cigar"] == f"{L}M"
    assert second["flag"] == 0x93 and second["pos"] == r0 + 1
    assert "NM:i:2" in second["tags"]
    assert first["tlen"] == r0 + L - l0 == -second["tlen"]
    # pair 1: R2 leftmost forward (0xA3), R1 reversed rightmost (0x53)
    first = next(r for r in by["p1"] if r["flag"] & 0x40)
    second = next(r for r in by["p1"] if r["flag"] & 0x80)
    assert first["flag"] == 0x53 and first["pos"] == r1 + 1
    assert "NM:i:1" in first["tags"]
    assert second["flag"] == 0xA3 and second["pos"] == l1 + 1
    assert "NM:i:0" in second["tags"]
    assert second["tlen"] == r1 + L - l1 == -first["tlen"]


def test_sam_paired_edit_cigars(tmp_path, rng, monkeypatch):
    """--sam --paired --edits E: both mates are re-aligned on the host;
    an indel mate carries a real I/D CIGAR and TLEN uses the right
    mate's actual reference span."""
    monkeypatch.chdir(tmp_path)
    n, L, E = 6000, 30, 1
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    with open("g.fa", "wb") as fp:
        fp.write(b">c\n" + decode_bases(codes) + b"\n")
    # R1: deletion read at l (consumes L+1 ref bases); rc(R2) exact at r
    l, r = 900, 1200
    r1_read = np.concatenate(
        [codes[l : l + 9], codes[l + 10 : l + L + 1]]
    )[:L].astype(np.uint8)
    r2_read = reverse_complement(codes[r : r + L][None])[0]
    with open("a.qry", "wb") as fp:
        fp.write(b"> e0\n%s\n" % decode_bases(r1_read))
    with open("b.qry", "wb") as fp:
        fp.write(b"> e0\n%s\n" % decode_bases(r2_read))
    cli.main(["locate", "g.fa", str(n), "a.qry", str(L), "1",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--paired", "b.qry", "--insert-min", "250",
              "--insert-max", "400", "--edits", str(E), "--sam",
              "--output", "o.sam"])
    _, recs = _parse("o.sam")
    first = next(r_ for r_ in recs if r_["flag"] & 0x40)
    second = next(r_ for r_ in recs if r_["flag"] & 0x80)
    assert first["flag"] == 0x63 and first["pos"] == l + 1
    assert "D" in first["cigar"] and "NM:i:1" in first["tags"]
    rd, rf, ops = _cigar_walk(first["cigar"])
    assert rd == L and rf == L + 1 and ops == 1
    assert second["flag"] == 0x93 and second["pos"] == r + 1
    assert second["cigar"] == f"{L}M" and "NM:i:0" in second["tags"]
    # TLEN from the exact right mate's span
    assert first["tlen"] == r + L - l == -second["tlen"]


def _phred(L, seed):
    """An asymmetric Phred+33 string (q[0] != q[-1]) so reversal shows."""
    return "".join(chr(33 + ((seed + 3 * j) % 60)) for j in range(L))


def test_sam_fastq_quals(tmp_path, rng, monkeypatch):
    """FASTQ input: QUAL rides into the SAM records — as sequenced on
    plus-strand and unmapped records, REVERSED on minus-strand (FLAG
    0x10) records, matching SEQ's forward-reference orientation."""
    monkeypatch.chdir(tmp_path)
    n, L = 5000, 24
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    _write_two_contig_ref(codes, "g.fa")
    sp = int(rng.integers(0, 2600 - L))
    sm = int(rng.integers(2600, n - L))
    reads = np.stack([
        codes[sp : sp + L],
        reverse_complement(codes[sm : sm + L][None])[0],
        rng.integers(0, 4, size=L, dtype=np.uint8),
    ])
    quals = [_phred(L, s) for s in (0, 7, 21)]
    with open("q.fastq", "w") as fp:
        for i in range(3):
            fp.write(f"@x{i}\n{decode_bases(reads[i]).decode()}\n+\n"
                     f"{quals[i]}\n")
    cli.main(["locate", "g.fa", str(n), "q.fastq", str(L), "3",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--sam", "--output", "o.sam"])
    _, recs = _parse("o.sam")
    by = {r["qname"]: r for r in recs}
    assert by["x0"]["flag"] == 0 and by["x0"]["qual"] == quals[0]
    assert by["x1"]["flag"] == 16 and by["x1"]["qual"] == quals[1][::-1]
    assert by["x2"]["flag"] == 4 and by["x2"]["qual"] == quals[2]
    # FASTA input of the same reads keeps QUAL '*'
    with open("q.qry", "wb") as fp:
        for i in range(3):
            fp.write(b"> x%d\n%s\n" % (i, decode_bases(reads[i])))
    cli.main(["locate", "g.fa", str(n), "q.qry", str(L), "3",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--sam", "--output", "o2.sam"])
    _, recs2 = _parse("o2.sam")
    assert all(r["qual"] == "*" for r in recs2)


def test_sam_fastq_quals_paired_and_edits(tmp_path, rng, monkeypatch):
    """Paired FASTQ: each mate's QUAL rides its own records, reversed on
    the reverse-complemented mate; same under --edits re-alignment."""
    monkeypatch.chdir(tmp_path)
    n, L = 6000, 24
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    with open("g.fa", "wb") as fp:
        fp.write(b">c\n" + decode_bases(codes) + b"\n")
    f0, frag = 900, 300
    r1_read = codes[f0 : f0 + L]
    r2_read = reverse_complement(codes[f0 + frag - L : f0 + frag][None])[0]
    q1, q2 = _phred(L, 1), _phred(L, 11)
    for name, read, q in (("a.fastq", r1_read, q1),
                          ("b.fastq", r2_read, q2)):
        with open(name, "w") as fp:
            fp.write(f"@p0\n{decode_bases(read).decode()}\n+\n{q}\n")
    for extra, out in ((["--edits", "1"], "oe.sam"), ([], "o.sam")):
        cli.main(["locate", "g.fa", str(n), "a.fastq", str(L), "1",
                  "--k", "2", "--d", "64", "--sample-rate", "8",
                  "--paired", "b.fastq", "--insert-min", "250",
                  "--insert-max", "400", "--sam", "--output", out]
                 + extra)
        _, recs = _parse(out)
        first = next(r for r in recs if r["flag"] & 0x40)
        second = next(r for r in recs if r["flag"] & 0x80)
        assert first["flag"] == 0x63 and first["qual"] == q1
        assert second["flag"] == 0x93 and second["qual"] == q2[::-1]


def test_sam_fastq_quals_mixed_length(tmp_path, rng, monkeypatch):
    """Mixed-length FASTQ through `tpufm align` (the grouped paths):
    every read keeps its own-length QUAL."""
    monkeypatch.chdir(tmp_path)
    n = 4000
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    with open("g.fa", "wb") as fp:
        fp.write(b">c\n" + decode_bases(codes) + b"\n")
    lens = [24, 30, 24]
    starts = [100, 700, 1900]
    quals = [_phred(L, 5 * i) for i, L in enumerate(lens)]
    with open("q.fastq", "w") as fp:
        for i, (s, L) in enumerate(zip(starts, lens)):
            fp.write(f"@m{i}\n{decode_bases(codes[s : s + L]).decode()}"
                     f"\n+\n{quals[i]}\n")
    for extra, out in (([], "o.sam"), (["--mismatches", "1"], "om.sam")):
        cli.main(["align", "g.fa", "q.fastq", "--sample-rate", "8",
                  "--output", out] + extra)
        _, recs = _parse(out)
        by = {r["qname"]: r for r in recs if not r["flag"] & 0x100}
        for i, (s, L) in enumerate(zip(starts, lens)):
            r = by[f"m{i}"]
            assert r["pos"] == s + 1 and len(r["qual"]) == L
            assert r["qual"] == quals[i]


def test_load_query_quals_guards(tmp_path):
    """FASTA -> None; malformed per-read qual length -> that read None;
    empty-sequence FASTQ records skipped (mirrors load_queries)."""
    from tpufm.io.fasta import load_query_quals

    fa = tmp_path / "a.fa"
    fa.write_text(">r0\nACGT\n")
    assert load_query_quals(str(fa)) is None
    fq = tmp_path / "a.fastq"
    fq.write_text("@r0\nACGT\n+\nIIII\n"
                  "@empty\n\n+\n\n"
                  "@r1\nACGT\n+\nIII\n"      # truncated qual
                  "@r2\nACGT\n+\n!!II\n")
    assert load_query_quals(str(fq)) == ["IIII", None, "!!II"]

"""BAM output (tpufm/io/bam.py): bgzf framing, binary record encoding,
and the CLI --bam path — all verified differentially against the SAM
text writer (io/sam.py), which is itself field-validated in
tests/test_sam.py. The reference suite has no SAM/BAM at all; this is
tpufm extension surface."""

import gzip
import struct

import numpy as np
import pytest

from tpufm import cli
from tpufm.io.bam import (
    bgzf_compress,
    bgzf_decompress,
    read_bam,
    reg2bin,
    sam_to_bam,
    write_bam,
)
from tpufm.io.fasta import write_reference
from tpufm.utils.encoding import decode_bases


def test_bgzf_roundtrip(rng):
    for size in (0, 1, 100, 0xE000, 0xE000 + 1, 3 * 0xE000 + 17):
        # text-ish data (compressible, like real BAM payloads)
        data = rng.integers(0, 16, size=size, dtype=np.uint8).tobytes()
        blob = bgzf_compress(data)
        assert bgzf_decompress(blob) == data
        # the stream is ALSO valid multi-member gzip (samtools/zcat
        # compatibility is the whole point of bgzf)
        assert gzip.decompress(blob) == data
        # trailing EOF marker present (spec 4.1.2)
        assert blob.endswith(bytes.fromhex(
            "1f8b08040000000000ff0600424302001b0003000000000000000000"))


def test_bgzf_member_sizes():
    blob = bgzf_compress(b"A" * 200000)
    off, members = 0, []
    while off < len(blob):
        assert blob[off : off + 4] == b"\x1f\x8b\x08\x04"
        bsize = struct.unpack_from("<H", blob, off + 16)[0] + 1
        members.append(bsize)
        off += bsize
    assert off == len(blob)
    assert all(m <= 0x10000 for m in members)
    assert len(members) == 200000 // 0xE000 + 1 + 1  # data members + EOF


def test_reg2bin_spec_values():
    # C reference implementation from SAM spec v1.6 section 5.3
    def spec(beg, end):
        end -= 1
        if beg >> 14 == end >> 14:
            return ((1 << 15) - 1) // 7 + (beg >> 14)
        if beg >> 17 == end >> 17:
            return ((1 << 12) - 1) // 7 + (beg >> 17)
        if beg >> 20 == end >> 20:
            return ((1 << 9) - 1) // 7 + (beg >> 20)
        if beg >> 23 == end >> 23:
            return ((1 << 6) - 1) // 7 + (beg >> 23)
        if beg >> 26 == end >> 26:
            return ((1 << 3) - 1) // 7 + (beg >> 26)
        return 0

    rng = np.random.default_rng(5)
    for _ in range(200):
        beg = int(rng.integers(0, 1 << 29))
        end = beg + int(rng.integers(1, 1000))
        assert reg2bin(beg, end) == spec(beg, end)
    assert reg2bin(0, 1) == 4681  # first 16kb bin


SAM_TEXT = (
    "@HD\tVN:1.6\tSO:unknown\n"
    "@SQ\tSN:chr1\tLN:10000\n"
    "@SQ\tSN:chr2\tLN:5000\n"
    "@PG\tID:tpufm\tPN:tpufm\tCL:test\n"
    # plus-strand primary with tag
    "r1\t0\tchr1\t100\t60\t8M\t*\t0\t0\tACGTACGT\t*\tNM:i:0\n"
    # minus-strand secondary, odd-length seq (nibble padding), N base
    "r1\t272\tchr2\t31\t0\t7M\t*\t0\t0\tACGTANC\t*\tNM:i:2\n"
    # unmapped
    "r2\t4\t*\t0\t0\t*\t*\t0\t0\tGGGG\t*\n"
    # proper pair with '=' RNEXT, signed TLEN, real quals, M/I/D cigar
    "p1\t99\tchr1\t200\t60\t3M1I2M1D2M\t=\t260\t100\tACGTACGT\tIIIIIIII\t"
    "NM:i:2\tXS:i:-5\n"
    "p1\t147\tchr1\t260\t60\t8M\t=\t200\t-100\tTTTTACGT\tFFFFFFFF\tNM:i:0\n"
)


def test_sam_to_bam_roundtrip(tmp_path):
    path = str(tmp_path / "t.bam")
    write_bam(path, SAM_TEXT)
    header, records = read_bam(path)
    assert header == "\n".join(
        l for l in SAM_TEXT.split("\n") if l.startswith("@")
    ) + "\n"
    expect = [l.split("\t") for l in SAM_TEXT.split("\n")
              if l and not l.startswith("@")]
    assert records == expect


def test_sam_to_bam_non_ascii_stays_in_sync(tmp_path):
    """A stray non-ASCII char in SEQ or QUAL must not desynchronize the
    record layout: every QUAL char encodes to exactly one byte (latin-1
    bytes round-trip; anything else degrades to '?'), odd SEQ bases
    degrade to 'N', and a QUAL whose length disagrees with SEQ raises a
    clear error instead of writing a corrupt record."""
    header = "@HD\tVN:1.6\n@SQ\tSN:c\tLN:100\n"

    def rec(seq, qual):
        return (header
                + f"r0\t0\tc\t5\t60\t{len(seq)}M\t*\t0\t0\t{seq}\t{qual}\n"
                + "r1\t0\tc\t9\t60\t4M\t*\t0\t0\tACGT\t*\tNM:i:0\n")

    path = str(tmp_path / "n.bam")
    # latin-1-encodable qual byte round-trips exactly
    write_bam(path, rec("ACGT", "II\xe9I"))
    _, records = read_bam(path)
    assert records[0][10] == "II\xe9I" and records[1][11] == "NM:i:0"
    # non-latin-1 (e.g. U+FFFD from a corrupt FASTQ) degrades per-char
    write_bam(path, rec("ACGT", "II�I"))
    _, records = read_bam(path)
    assert len(records[0][10]) == 4 and records[1][11] == "NM:i:0"
    # non-ASCII base -> 'N', record still parses
    write_bam(path, rec("AC\xe9T", "IIII"))
    _, records = read_bam(path)
    assert records[0][9] == "ACNT" and len(records) == 2
    with pytest.raises(ValueError, match="QUAL length"):
        sam_to_bam(rec("ACGT", "II"))


def test_bam_binary_fields(tmp_path):
    raw = sam_to_bam(SAM_TEXT)
    assert raw[:4] == b"BAM\x01"
    l_text = struct.unpack_from("<i", raw, 4)[0]
    off = 8 + l_text
    assert struct.unpack_from("<i", raw, off)[0] == 2  # n_ref
    off += 4
    l_name = struct.unpack_from("<i", raw, off)[0]
    assert raw[off + 4 : off + 4 + l_name] == b"chr1\x00"
    assert struct.unpack_from("<i", raw, off + 4 + l_name)[0] == 10000
    off += 8 + l_name
    l_name2 = struct.unpack_from("<i", raw, off)[0]
    off += 8 + l_name2
    # first record: POS is 0-based, bin matches reg2bin, cigar packed
    block = struct.unpack_from("<I", raw, off)[0]
    rec = raw[off + 4 : off + 4 + block]
    ref_id, pos0, ln, mapq, bam_bin, n_cig, flag = struct.unpack_from(
        "<iiBBHHH", rec
    )
    assert (ref_id, pos0, mapq, flag) == (0, 99, 60, 0)
    assert bam_bin == reg2bin(99, 107)
    assert n_cig == 1
    cig = struct.unpack_from("<I", rec, 32 + ln)[0]
    assert cig == (8 << 4) | 0  # 8M
    # SEQ nibbles: ACGTACGT -> 1,2,4,8 pairs
    seq = rec[32 + ln + 4 : 32 + ln + 4 + 4]
    assert seq == bytes([0x12, 0x48, 0x12, 0x48])
    # QUAL '*' -> 0xFF fill
    assert rec[32 + ln + 8 : 32 + ln + 16] == b"\xff" * 8


@pytest.fixture
def ref(tmp_path, rng):
    n = 4000
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    path = tmp_path / "ref.fa"
    write_reference(path, decode_bases(codes))
    return path, n, codes


def test_cli_locate_bam_matches_sam(tmp_path, ref, monkeypatch):
    """locate --sam --bam writes the SAME records as --sam, binary."""
    path, n, codes = ref
    monkeypatch.chdir(tmp_path)
    cli.main(["genreads", str(path), str(n), "24", "32", "--seed", "7"])
    qry = f"Q-32_B-24_R-{n}.qry"
    common = ["locate", str(path), str(n), qry, "24", "32",
              "--k", "2", "--d", "64", "--sample-rate", "8", "--sam"]
    cli.main(common + ["--output", str(tmp_path / "out.sam")])
    cli.main(common + ["--bam", "--output", str(tmp_path / "out.bam")])
    sam_lines = (tmp_path / "out.sam").read_text().splitlines()
    header, records = read_bam(str(tmp_path / "out.bam"))
    assert header.splitlines() == [
        l for l in sam_lines if l.startswith("@")
    ]
    assert records == [
        l.split("\t") for l in sam_lines if not l.startswith("@")
    ]


def test_cli_align_bam_default_name(tmp_path, ref, monkeypatch):
    path, n, codes = ref
    monkeypatch.chdir(tmp_path)
    cli.main(["genreads", str(path), str(n), "24", "16", "--seed", "9"])
    qry = f"Q-16_B-24_R-{n}.qry"
    cli.main(["align", str(path), qry, "--bam"])
    header, records = read_bam(f"{qry}.bam")
    assert "@SQ" in header
    assert len([r for r in records if not int(r[1]) & 0x100]) == 16


def test_cli_paired_bam_matches_sam(tmp_path, ref, monkeypatch):
    """locate --paired --sam --bam: paired records (flags, '=' RNEXT,
    TLEN) survive the BAM round trip identically."""
    path, n, codes = ref
    monkeypatch.chdir(tmp_path)
    cli.main(["genreads", str(path), str(n), "24", "16", "--seed", "21",
              "--paired", "--insert-min", "60", "--insert-max", "200"])
    r1, r2 = f"Q-16_B-24_R-{n}_1.qry", f"Q-16_B-24_R-{n}_2.qry"
    common = ["locate", str(path), str(n), r1, "24", "16",
              "--k", "2", "--d", "64", "--sample-rate", "8",
              "--paired", r2, "--insert-min", "60", "--insert-max", "200",
              "--sam"]
    cli.main(common + ["--output", str(tmp_path / "p.sam")])
    cli.main(common + ["--bam", "--output", str(tmp_path / "p.bam")])
    sam_lines = (tmp_path / "p.sam").read_text().splitlines()
    header, records = read_bam(str(tmp_path / "p.bam"))
    assert records == [
        l.split("\t") for l in sam_lines if not l.startswith("@")
    ]
    # paired flags and '=' RNEXT survived
    mapped = [r for r in records if not int(r[1]) & 4]
    assert mapped and all(int(r[1]) & 1 for r in mapped)
    assert all(r[6] == "=" for r in mapped)


def test_cli_fastq_quals_survive_bam(tmp_path, ref, monkeypatch):
    """FASTQ QUAL strings survive the BAM round trip byte-for-byte
    (including the minus-strand reversal done at the SAM layer)."""
    path, n, codes = ref
    monkeypatch.chdir(tmp_path)
    from tpufm.utils.encoding import decode_bases, reverse_complement

    rng = np.random.default_rng(3)
    L = 24
    sp, sm = 100, 2000
    reads = [codes[sp : sp + L],
             reverse_complement(codes[sm : sm + L][None])[0]]
    quals = ["".join(chr(33 + ((7 * j + i) % 60)) for j in range(L))
             for i in range(2)]
    with open("q.fastq", "w") as fp:
        for i, r in enumerate(reads):
            fp.write(f"@f{i}\n{decode_bases(r).decode()}\n+\n{quals[i]}\n")
    common = ["locate", str(path), str(n), "q.fastq", str(L), "2",
              "--k", "2", "--d", "64", "--sample-rate", "8", "--sam"]
    cli.main(common + ["--output", "out.sam"])
    cli.main(common + ["--bam", "--output", "out.bam"])
    sam_recs = [l.split("\t") for l in
                open("out.sam").read().splitlines()
                if not l.startswith("@")]
    _, bam_recs = read_bam("out.bam")
    assert bam_recs == sam_recs
    by = {r[0]: r for r in bam_recs}
    assert by["f0"][10] == quals[0]
    assert by["f1"][10] == quals[1][::-1]

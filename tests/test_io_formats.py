"""Gzipped FASTA/query input and FASTQ queries — real-world read-set shapes
the reference's loaders never handled (its readRef/loadQueries are plain-text
FASTA only, common/common.c:42-199)."""

import gzip

import numpy as np

from tpufm.io.contigs import read_contigs
from tpufm.io.fasta import load_queries, read_reference, write_reference
from tpufm.utils.encoding import decode_bases


def test_gzip_reference_roundtrip(tmp_path, rng):
    codes = rng.integers(0, 4, size=2000, dtype=np.uint8)
    plain = tmp_path / "ref.fa"
    write_reference(plain, decode_bases(codes))
    gz = tmp_path / "ref.fa.gz"
    gz.write_bytes(gzip.compress(plain.read_bytes()))
    np.testing.assert_array_equal(read_reference(gz, 2000), codes)
    # detection is by magic bytes, not extension
    sneaky = tmp_path / "ref2.fa"
    sneaky.write_bytes(gz.read_bytes())
    np.testing.assert_array_equal(read_reference(sneaky, 2000), codes)
    # contig scan follows the same path
    cmap = read_contigs(gz)
    assert cmap.total == 2000 and len(cmap.names) == 1


def test_fastq_queries(tmp_path, rng):
    reads = rng.integers(0, 4, size=(20, 36), dtype=np.uint8)
    fq = tmp_path / "r.fastq"
    with open(fq, "wb") as fp:
        for i, r in enumerate(reads):
            seq = decode_bases(r)
            fp.write(b"@read%d some desc\n%s\n+\n%s\n" % (i, seq, b"I" * 36))
    np.testing.assert_array_equal(load_queries(fq, 36, 20), reads)
    # gzipped FASTQ too
    fqgz = tmp_path / "r.fastq.gz"
    fqgz.write_bytes(gzip.compress(fq.read_bytes()))
    np.testing.assert_array_equal(load_queries(fqgz, 36, 20), reads)


def test_fasta_queries_unchanged(tmp_path, rng):
    reads = rng.integers(0, 4, size=(8, 24), dtype=np.uint8)
    qry = tmp_path / "q.qry"
    with open(qry, "wb") as fp:
        for i, r in enumerate(reads):
            fp.write(b"> r%d\n%s\n" % (i, decode_bases(r)))
    np.testing.assert_array_equal(load_queries(qry, 24, 8), reads)


def test_vectorized_loader_edges(tmp_path):
    """The numpy line scan (_seq_extents) matches the loader contract on
    edge inputs: missing final newline, CRLF endings, blank lines,
    FASTQ empty-sequence records, gzip, and the num_queries guards."""
    import gzip

    import numpy as np
    import pytest

    from tpufm.io.fasta import (
        load_queries,
        load_queries_varlen,
        sniff_reads,
    )
    from tpufm.utils.encoding import encode_bases

    fa = tmp_path / "e.qry"
    fa.write_bytes(b"> a\r\nACGT\r\n\r\n> b\nTTTT")  # CRLF, blank, no EOL
    got = load_queries(str(fa), 4)
    np.testing.assert_array_equal(got, encode_bases(b"ACGTTTTT").reshape(2, 4))
    assert sniff_reads(str(fa)) == (4, 4, 2)
    fq = tmp_path / "e.fastq"
    fq.write_bytes(b"@a\nACGT\n+\nIIII\n@skip\n\n+\n\n@b\nGGTTAA\n+\nIIIIII")
    v = load_queries_varlen(str(fq))
    assert v.shape == (2, 6)
    np.testing.assert_array_equal(v[0], [0xFF, 0xFF] + list(encode_bases(b"ACGT")))
    np.testing.assert_array_equal(v[1], encode_bases(b"GGTTAA"))
    gz = tmp_path / "e.fastq.gz"
    gz.write_bytes(gzip.compress(fq.read_bytes()))
    np.testing.assert_array_equal(load_queries_varlen(str(gz)), v)
    with pytest.raises(ValueError, match="only 2 reads"):
        load_queries_varlen(str(fq), 3)
    with pytest.raises(ValueError, match="expected 4"):
        load_queries(str(fq), 4)  # the 6-mer read
    with pytest.raises(ValueError, match="no reads"):
        (tmp_path / "empty.qry").write_bytes(b"> only header\n")
        load_queries_varlen(str(tmp_path / "empty.qry"))


def test_packed_loaders_match_list_loaders(tmp_path):
    """load_query_names_packed / load_query_quals_packed are vectorized
    twins of the list loaders: identical per-read values across FASTQ,
    multi-line FASTA with header inheritance, headerless reads, '> x'
    leading-blank headers, nameless headers, malformed quals, CRLF, and
    the num_queries pad."""
    from tpufm.io.fasta import (
        load_query_names,
        load_query_names_packed,
        load_query_quals,
        load_query_quals_packed,
    )

    fq = tmp_path / "a.fastq"
    fq.write_bytes(
        b"@r0 extra words\nACGT\n+\nIIII\n"
        b"@skip\n\n+\n\n"
        b"@r1\r\nACGTA\r\n+\r\nIIIII\r\n"
        b"@\nGG\n+\nII\n"          # nameless header
        b"@r3\nACGT\n+\nIII\n"     # malformed qual
    )
    for n in (None, 3, 7):
        assert list(load_query_names_packed(str(fq), n)) == \
            load_query_names(str(fq), n)
        pq = load_query_quals_packed(str(fq), n)
        lq = load_query_quals(str(fq), n)
        assert [q or None for q in pq] == lq
    fa = tmp_path / "a.fa"
    fa.write_bytes(
        b"ORPHAN\n"                 # read before any header
        b"> x0\nAAAA\nCCCC\n"       # two reads inherit x0
        b">\nGGGG\n"                # nameless header
        b">y1 desc\nTTTT"           # no trailing newline
    )
    for n in (None, 2, 8):
        assert list(load_query_names_packed(str(fa), n)) == \
            load_query_names(str(fa), n)
        assert load_query_quals_packed(str(fa), n) is None


def test_write_reads_fasta_matches_loop_oracle(tmp_path, rng):
    """The vectorized multi-FASTA writer is byte-identical to a per-read
    loop of '>ridN s-e' + decode_bases lines (the reference's
    resources/genreads.py:71-76 output shape), across digit-count
    boundaries, starts=None, chunk-boundary sizes, non-contiguous
    views, and >2^31 start values (the int64 divmod fallback)."""
    from tpufm.io.genreads import generate_reads, write_reads_fasta

    def loop_oracle(reads, starts):
        out = bytearray()
        for i in range(reads.shape[0]):
            s = int(starts[i]) if starts is not None else 0
            out += b">rid%d %d-%d\n" % (i, s, s + reads.shape[1])
            out += decode_bases(reads[i]) + b"\n"
        return bytes(out)

    path = str(tmp_path / "q.qry")
    codes = rng.integers(0, 4, 1 << 16, dtype=np.uint8)
    for num, length in [(1, 5), (9, 1), (101, 120), (15000, 33)]:
        reads, starts = generate_reads(codes, length, num, seed=3,
                                       return_starts=True)
        for st in (None, starts):
            write_reads_fasta(path, reads, st)
            assert open(path, "rb").read() == loop_oracle(reads, st)
    # non-contiguous view + empty set + huge starts
    reads, starts = generate_reads(codes, 40, 200, seed=4, return_starts=True)
    write_reads_fasta(path, reads[::2], starts[::2])
    assert open(path, "rb").read() == loop_oracle(reads[::2], starts[::2])
    write_reads_fasta(path, np.zeros((0, 10), np.uint8))
    assert open(path, "rb").read() == b""
    big_starts = np.array([0, 2**31 - 1, 2**31, 3_200_000_000], np.int64)
    reads = rng.integers(0, 4, (4, 8), dtype=np.uint8)
    write_reads_fasta(path, reads, big_starts)
    assert open(path, "rb").read() == loop_oracle(reads, big_starts)

"""Minimal SAM (v1.6) emission for exact matches — single-end (both
strands) and paired-end.

Scope is deliberately exact-match only: CIGAR is then always `<L>M` with
NM:i:0, and FLAG semantics are unambiguous. Hamming/edit hits need
per-alignment CIGARs (edit paths are not recovered by the Myers scan),
so `--sam` rejects those modes for now (docs/ROADMAP.md). The reference
suite has no position output at all, let alone SAM; this exists so tpufm
plugs into samtools-style pipelines.

Conventions implemented (SAM spec v1.6):
- POS is 1-based, RNAME/POS resolved through the multi-FASTA record map
  (tpufm.io.contigs.ContigMap); hits crossing a record boundary are
  concatenation artifacts of the indexed text and are DROPPED here (the
  `.pos` format keeps them, flagged `:spans`).
- SEQ is the forward-reference orientation: for a minus-strand alignment
  (FLAG 0x10) the reverse complement of the read as sequenced.
- One primary record per mapped read; further sites repeat as secondary
  (FLAG 0x100) records. MAPQ 255 (unavailable), QUAL '*'.
- Paired FR records carry 0x1|0x2 (paired, proper), 0x40/0x80 (first /
  second of pair), 0x10/0x20 (self / mate reversed), RNEXT '=', PNEXT,
  and signed TLEN (+fragment on the leftmost mate, -fragment on the
  rightmost). Pairs with no proper placement emit the standard
  both-unmapped pair (FLAG 77 / 141).
"""

from __future__ import annotations

import numpy as np

from tpufm.utils.encoding import decode_bases, reverse_complement

_SENT = np.uint32(0xFFFFFFFF)


def sam_header(cmap, extra_pg: str = "") -> str:
    """@HD/@SQ/@PG lines from a ContigMap."""
    lines = ["@HD\tVN:1.6\tSO:unknown"]
    ends = np.append(cmap.starts[1:], cmap.total)
    for name, start, end in zip(cmap.names, cmap.starts, ends):
        lines.append(f"@SQ\tSN:{name}\tLN:{int(end - start)}")
    pg = "@PG\tID:tpufm\tPN:tpufm"
    if extra_pg:
        pg += f"\tCL:{extra_pg}"
    lines.append(pg)
    return "\n".join(lines) + "\n"


def _resolve(cmap, pos: int, span_len: int):
    """(name, 1-based offset) or None when the hit crosses a record
    boundary (dropped from SAM output)."""
    idx, off, spans = cmap.resolve(
        np.asarray([pos], np.uint32), query_len=span_len
    )
    if idx[0] < 0 or spans[0]:
        return None
    return cmap.names[idx[0]], int(off[0]) + 1


def sam_single_records(names, reads, pos_fwd, pos_rc, cmap, codes=None) -> str:
    """One SAM block per read: primary + secondary records over both
    strands' hits, or one unmapped record.

    names: list[str] QNAMEs. reads: uint8 [B, L] as sequenced.
    pos_fwd/pos_rc: uint32 [B, max_hits] sentinel-padded absolute
    positions of the read / its reverse complement. codes: the 2-bit
    reference — when given, NM:i is the per-site Hamming distance
    (Hamming alignments are pure <L>M CIGARs, so this covers
    --mismatches output exactly); when None the sites are exact and
    NM:i:0."""
    out = []
    L = reads.shape[1]
    for i, name in enumerate(names):
        fwd = reads[i]
        rc = reverse_complement(reads[i][None])[0]
        seq_f = decode_bases(fwd).decode()
        seq_r = decode_bases(rc).decode()
        # the sequence as it matches the FORWARD reference per strand
        sites = [(int(p), 0, seq_f, fwd) for p in pos_fwd[i] if p != _SENT]
        sites += [(int(p), 16, seq_r, rc) for p in pos_rc[i] if p != _SENT]
        emitted = 0
        for p, flag, seq, match in sites:
            r = _resolve(cmap, p, L)
            if r is None:
                continue
            rname, pos1 = r
            nm = 0 if codes is None else int(
                (codes[p : p + L] != match).sum()
            )
            f = flag | (0x100 if emitted else 0)
            out.append(
                f"{name}\t{f}\t{rname}\t{pos1}\t255\t{L}M\t*\t0\t0\t"
                f"{seq}\t*\tNM:i:{nm}"
            )
            emitted += 1
        if not emitted:
            out.append(f"{name}\t4\t*\t0\t0\t*\t*\t0\t0\t{seq_f}\t*")
    return "\n".join(out) + "\n"


def sam_paired_records(names, r1, r2, pairs, strand, counts, cmap) -> str:
    """Two SAM records per read pair: the primary proper pair (additional
    pairs as secondary record pairs), or the standard both-unmapped pair.

    pairs/strand/counts are PairedEndEngine.pair outputs; `pairs[i, j]` is
    (leftmost mate start, rightmost mate start) and strand 0 means R1 is
    the plus-strand (leftmost) mate."""
    out = []
    L1, L2 = r1.shape[1], r2.shape[1]
    for i, name in enumerate(names):
        seq1f = decode_bases(r1[i]).decode()
        seq1r = decode_bases(reverse_complement(r1[i][None])[0]).decode()
        seq2f = decode_bases(r2[i]).decode()
        seq2r = decode_bases(reverse_complement(r2[i][None])[0]).decode()
        emitted = 0
        for j in range(pairs.shape[1]):
            if pairs[i, j, 0] == _SENT:
                continue
            left, right = int(pairs[i, j, 0]), int(pairs[i, j, 1])
            if strand[i, j] == 0:
                # R1 forward at left, rc(R2) at right
                p1, f1, s1, l1 = left, 0x63, seq1f, L1   # 1|2|32|64
                p2, f2, s2, l2 = right, 0x93, seq2r, L2  # 1|2|16|128
                frag = right + L2 - left
            else:
                # R2 forward at left, rc(R1) at right
                p1, f1, s1, l1 = right, 0x53, seq1r, L1  # 1|2|16|64
                p2, f2, s2, l2 = left, 0xA3, seq2f, L2   # 1|2|32|128
                frag = right + L1 - left
            ra = _resolve(cmap, p1, l1)
            rb = _resolve(cmap, p2, l2)
            if ra is None or rb is None or ra[0] != rb[0]:
                continue
            sec = 0x100 if emitted else 0
            t1 = frag if p1 <= p2 else -frag
            out.append(
                f"{name}\t{f1 | sec}\t{ra[0]}\t{ra[1]}\t255\t{l1}M\t=\t"
                f"{rb[1]}\t{t1}\t{s1}\t*\tNM:i:0"
            )
            out.append(
                f"{name}\t{f2 | sec}\t{rb[0]}\t{rb[1]}\t255\t{l2}M\t=\t"
                f"{ra[1]}\t{-t1}\t{s2}\t*\tNM:i:0"
            )
            emitted += 1
        if not emitted:
            out.append(f"{name}\t77\t*\t0\t0\t*\t*\t0\t0\t{seq1f}\t*")
            out.append(f"{name}\t141\t*\t0\t0\t*\t*\t0\t0\t{seq2f}\t*")
    return "\n".join(out) + "\n"

"""SAM (v1.6) emission — single-end (both strands, exact / Hamming /
edit distance) and exact paired-end.

Exact and Hamming sites are pure `<L>M` CIGARs (substitutions live under
M) with NM:i the per-site distance; edit-distance sites are re-aligned
on the host (utils/align.edit_alignments) for real M/I/D CIGARs. The
reference suite has no position output at all, let alone SAM; this
exists so tpufm plugs into samtools-style pipelines.

Conventions implemented (SAM spec v1.6):
- POS is 1-based, RNAME/POS resolved through the multi-FASTA record map
  (tpufm.io.contigs.ContigMap); hits crossing a record boundary are
  concatenation artifacts of the indexed text and are DROPPED here (the
  `.pos` format keeps them, flagged `:spans`).
- SEQ is the forward-reference orientation: for a minus-strand alignment
  (FLAG 0x10) the reverse complement of the read as sequenced.
- One primary record per mapped read; further sites repeat as secondary
  (FLAG 0x100) records. QUAL '*'.
- MAPQ is the standard uniqueness heuristic: 60 when the lowest-NM site
  is unique among the reported sites, 0 when tied (multi-mapper).
  Caveat: sites beyond max_hits are not seen, so a read whose best site
  was truncated away can carry MAPQ 60 on a suboptimal site — the
  reported-site contract, stated here rather than hidden behind 255.
  Paired records reuse the same rule over the reported proper pairs.
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


def _mapq(nms) -> int:
    """60 when the lowest NM is unique among the reported sites, 0 when
    tied (multi-mapper), 0 when unmapped (caller emits FLAG 4 anyway)."""
    if not nms:
        return 0
    best = min(nms)
    return 60 if sum(1 for v in nms if v == best) == 1 else 0


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


def sam_single_records(names, reads, pos_fwd, pos_rc, cmap, codes=None) -> str:
    """One SAM block per read: primary + secondary records over both
    strands' hits, or one unmapped record. The PRIMARY record is the
    lowest-NM site (ties: forward strand first, then position order) —
    the representative-alignment convention; the rest carry 0x100.

    names: list[str] QNAMEs. reads: uint8 [B, L] as sequenced.
    pos_fwd/pos_rc: uint32 [B, max_hits] sentinel-padded absolute
    positions of the read / its reverse complement. codes: the 2-bit
    reference — when given, NM:i is the per-site Hamming distance
    (Hamming alignments are pure <L>M CIGARs, so this covers
    --mismatches output exactly); when None the sites are exact and
    NM:i:0."""
    L = reads.shape[1]
    rcs = reverse_complement(reads)
    # resolve every site in two vectorized passes (not per hit)
    idx_f, off_f, sp_f = cmap.resolve(pos_fwd, query_len=L)
    idx_r, off_r, sp_r = cmap.resolve(pos_rc, query_len=L)
    out = []
    for i, name in enumerate(names):
        seq_f = decode_bases(reads[i]).decode()
        seq_r = decode_bases(rcs[i]).decode()
        sites = []  # (nm, order, flag, rname, pos1, seq)
        order = 0
        for pos_row, idx, off, sp, flag, seq, match in (
            (pos_fwd[i], idx_f[i], off_f[i], sp_f[i], 0, seq_f, reads[i]),
            (pos_rc[i], idx_r[i], off_r[i], sp_r[i], 16, seq_r, rcs[i]),
        ):
            for j in range(pos_row.shape[0]):
                if pos_row[j] == _SENT or idx[j] < 0 or sp[j]:
                    continue
                p = int(pos_row[j])
                nm = 0 if codes is None else int(
                    (codes[p : p + L] != match).sum()
                )
                sites.append(
                    (nm, order, flag, cmap.names[idx[j]], int(off[j]) + 1, seq)
                )
                order += 1
        sites.sort(key=lambda s: (s[0], s[1]))
        mapq = _mapq([s[0] for s in sites])
        for emitted, (nm, _, flag, rname, pos1, seq) in enumerate(sites):
            f = flag | (0x100 if emitted else 0)
            out.append(
                f"{name}\t{f}\t{rname}\t{pos1}\t{mapq}\t{L}M\t*\t0\t0\t"
                f"{seq}\t*\tNM:i:{nm}"
            )
        if not sites:
            out.append(f"{name}\t4\t*\t0\t0\t*\t*\t0\t0\t{seq_f}\t*")
    return "\n".join(out) + "\n"


def sam_edit_records(names, reads, pos_fwd, pos_rc, cmap, codes,
                     edits: int) -> str:
    """Edit-distance SAM records with REAL CIGARs: every reported site is
    re-aligned on the host (utils/align.edit_alignments — start-anchored
    free-end DP with traceback, batched over the hit list), yielding
    M/I/D CIGARs and NM:i. Primary is the lowest-NM site; span checks use
    each alignment's ACTUAL reference span, so sites near a contig end
    survive when their alignment fits."""
    from tpufm.utils.align import edit_alignments

    L = reads.shape[1]
    rcs = reverse_complement(reads)
    sites = []  # (read i, flag, abs pos)
    for i in range(len(names)):
        for p in pos_fwd[i]:
            if p != _SENT:
                sites.append((i, 0, int(p)))
        for p in pos_rc[i]:
            if p != _SENT:
                sites.append((i, 16, int(p)))
    if sites:
        mats = np.stack([
            (reads if f == 0 else rcs)[i] for i, f, _ in sites
        ])
        pos_arr = np.asarray([p for _, _, p in sites], np.int64)
        # chunk the re-alignment: the DP's pointer tensor is
        # [chunk, L, L+E] int8, so an unchunked genome-scale hit list
        # would exhaust host memory
        cigars, nms, spans = [], [], []
        for lo_i in range(0, len(sites), 1 << 16):
            c_, n_, s_ = edit_alignments(
                codes, mats[lo_i : lo_i + (1 << 16)],
                pos_arr[lo_i : lo_i + (1 << 16)], edits,
            )
            cigars.extend(c_)
            nms.append(n_)
            spans.append(s_)
        nm = np.concatenate(nms)
        ref_span = np.concatenate(spans)
        idx, off, _ = cmap.resolve(pos_arr.astype(np.uint32))
        ends = np.append(cmap.starts[1:], cmap.total)
        clen = ends[np.maximum(idx, 0)] - cmap.starts[np.maximum(idx, 0)]
        ok = (idx >= 0) & (off + ref_span <= clen)
    per_read = {}
    for j, (i, flag, _) in enumerate(sites):
        if not ok[j]:
            continue
        per_read.setdefault(i, []).append(
            (int(nm[j]), len(per_read.get(i, ())), flag,
             cmap.names[idx[j]], int(off[j]) + 1, cigars[j])
        )
    out = []
    for i, name in enumerate(names):
        rows = sorted(per_read.get(i, []))
        seq_f = decode_bases(reads[i]).decode()
        seq_r = decode_bases(rcs[i]).decode()
        mapq = _mapq([r[0] for r in rows])
        for emitted, (nm_j, _, flag, rname, pos1, cigar) in enumerate(rows):
            f = flag | (0x100 if emitted else 0)
            seq = seq_r if flag & 0x10 else seq_f
            out.append(
                f"{name}\t{f}\t{rname}\t{pos1}\t{mapq}\t{cigar}\t*\t0\t0\t"
                f"{seq}\t*\tNM:i:{nm_j}"
            )
        if not rows:
            out.append(f"{name}\t4\t*\t0\t0\t*\t*\t0\t0\t{seq_f}\t*")
    return "\n".join(out) + "\n"


def sam_paired_records(names, r1, r2, pairs, strand, cmap) -> str:
    """Two SAM records per read pair: the primary proper pair (additional
    pairs as secondary record pairs), or the standard both-unmapped pair.

    pairs/strand are PairedEndEngine.pair outputs; `pairs[i, j]` is
    (leftmost mate start, rightmost mate start) and strand 0 means R1 is
    the plus-strand (leftmost) mate."""
    out = []
    L1, L2 = r1.shape[1], r2.shape[1]
    r1r = reverse_complement(r1)
    r2r = reverse_complement(r2)
    # vectorized resolution of every pair's two mates; the span check
    # uses each mate's OWN length (left mate is R1 on strand 0, R2 on 1)
    idx_l, off_l, _ = cmap.resolve(pairs[..., 0])
    idx_r, off_r, _ = cmap.resolve(pairs[..., 1])
    cends = np.append(cmap.starts[1:], cmap.total)
    clen_l = (cends - cmap.starts)[np.maximum(idx_l, 0)]
    clen_r = (cends - cmap.starts)[np.maximum(idx_r, 0)]
    len_left = np.where(strand == 0, L1, L2)
    len_right = np.where(strand == 0, L2, L1)
    sp_l = off_l + len_left > clen_l
    sp_r = off_r + len_right > clen_r
    for i, name in enumerate(names):
        seq1f = decode_bases(r1[i]).decode()
        seq1r = decode_bases(r1r[i]).decode()
        seq2f = decode_bases(r2[i]).decode()
        seq2r = decode_bases(r2r[i]).decode()
        n_pairs = sum(
            1
            for j in range(pairs.shape[1])
            if pairs[i, j, 0] != _SENT
            and idx_l[i, j] >= 0
            and idx_l[i, j] == idx_r[i, j]
            and not sp_l[i, j]
            and not sp_r[i, j]
        )
        mapq = 60 if n_pairs == 1 else 0
        emitted = 0
        for j in range(pairs.shape[1]):
            if (
                pairs[i, j, 0] == _SENT
                or idx_l[i, j] < 0
                or idx_r[i, j] < 0
                or idx_l[i, j] != idx_r[i, j]
                or sp_l[i, j]
                or sp_r[i, j]
            ):
                continue
            left, right = int(pairs[i, j, 0]), int(pairs[i, j, 1])
            rname = cmap.names[idx_l[i, j]]
            lpos1, rpos1 = int(off_l[i, j]) + 1, int(off_r[i, j]) + 1
            if strand[i, j] == 0:
                # R1 forward at left, rc(R2) at right
                p1, f1, s1, l1 = lpos1, 0x63, seq1f, L1   # 1|2|32|64
                p2, f2, s2, l2 = rpos1, 0x93, seq2r, L2   # 1|2|16|128
                frag = right + L2 - left
            else:
                # R2 forward at left, rc(R1) at right
                p1, f1, s1, l1 = rpos1, 0x53, seq1r, L1   # 1|2|16|64
                p2, f2, s2, l2 = lpos1, 0xA3, seq2f, L2   # 1|2|32|128
                frag = right + L1 - left
            sec = 0x100 if emitted else 0
            t1 = frag if p1 <= p2 else -frag
            out.append(
                f"{name}\t{f1 | sec}\t{rname}\t{p1}\t{mapq}\t{l1}M\t=\t"
                f"{p2}\t{t1}\t{s1}\t*\tNM:i:0"
            )
            out.append(
                f"{name}\t{f2 | sec}\t{rname}\t{p2}\t{mapq}\t{l2}M\t=\t"
                f"{p1}\t{-t1}\t{s2}\t*\tNM:i:0"
            )
            emitted += 1
        if not emitted:
            out.append(f"{name}\t77\t*\t0\t0\t*\t*\t0\t0\t{seq1f}\t*")
            out.append(f"{name}\t141\t*\t0\t0\t*\t*\t0\t0\t{seq2f}\t*")
    return "\n".join(out) + "\n"

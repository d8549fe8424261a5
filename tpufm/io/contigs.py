"""Multi-FASTA contig map: absolute locate positions -> (contig, offset).

The index is built over the CONCATENATION of every record's sequence (the
reference's readRef does the same, common/common.c:42-76, so `tpufm build`
matches it byte-for-byte). For genomics output that absolute coordinate is
useless — users need chromosome:offset. ContigMap records each record's
start in concatenated space and resolves positions with one searchsorted;
hits whose match would run past the end of their contig (an artifact of the
concatenation, not a real occurrence in any single sequence) are flagged so
callers can drop them.
"""

from __future__ import annotations

import dataclasses

import numpy as np

_SENTINEL = np.uint32(0xFFFFFFFF)


@dataclasses.dataclass
class ContigMap:
    names: list[str]         #: one per FASTA record, in file order
    starts: np.ndarray       #: int64 [C] concatenated-space start of each
    total: int               #: total concatenated length the map covers

    def resolve(self, positions, query_len: int | None = None):
        """positions uint32 [...] -> (contig int32, offset int64, spans bool).

        contig = -1 wherever positions holds the 0xFFFFFFFF pad sentinel.
        spans = True where a query_len-long match starting at the position
        crosses into the next contig (only computed when query_len given).
        """
        p = np.asarray(positions)
        valid = p != _SENTINEL
        pos = p.astype(np.int64)
        idx = np.searchsorted(self.starts, pos, side="right") - 1
        idx = np.where(valid, idx, -1).astype(np.int32)
        off = np.where(valid, pos - self.starts[np.maximum(idx, 0)], 0)
        if query_len is None:
            spans = np.zeros(p.shape, dtype=bool)
        else:
            ends = np.append(self.starts[1:], self.total)
            spans = valid & (pos + query_len > ends[np.maximum(idx, 0)])
        return idx, off, spans

    def format(self, positions, query_len: int | None = None) -> list[str]:
        """Human-readable 'name:offset' per position; spanning hits get a
        ':spans' suffix; pad sentinels map to None (callers skip them)."""
        idx, off, spans = self.resolve(positions, query_len)
        out: list[str | None] = []
        for i, o, s in zip(idx.reshape(-1), off.reshape(-1), spans.reshape(-1)):
            if i < 0:
                out.append(None)
            else:
                out.append(f"{self.names[i]}:{o}" + (":spans" if s else ""))
        return out


def read_contigs(path, refsize: int | None = None) -> ContigMap:
    """Scan a (M)FASTA file for record boundaries in CONCATENATED space.

    Mirrors read_reference's semantics exactly (tpufm/io/fasta.py): every
    non-header line's characters count, reading stops once refsize bases are
    seen, and a record whose sequence was entirely truncated away is not
    listed. Header names are the first whitespace-separated token after '>'
    (the reference's own re-emitted headers are '> <size>', which yields the
    size as the name — name records for real FASTA inputs).
    """
    names: list[str] = []
    starts: list[int] = []
    total = 0
    pending: str | None = None
    from tpufm.io.fasta import open_maybe_gzip

    with open_maybe_gzip(path) as fp:
        first = fp.readline()
        if not first.startswith(b">"):
            raise ValueError(f"{path}: not a FASTA file (missing '>' header)")
        pending = _header_name(first, 0)
        for line in fp:
            if line.startswith(b">"):
                pending = _header_name(line, len(names))
                continue
            seq = line.strip()
            if not seq:
                continue
            if pending is not None:
                names.append(pending)
                starts.append(total)
                pending = None
            total += len(seq)
            if refsize is not None and total >= refsize:
                total = refsize
                break
    return ContigMap(
        names=names, starts=np.asarray(starts, dtype=np.int64), total=total
    )


def _header_name(line: bytes, index: int) -> str:
    toks = line[1:].split()
    return toks[0].decode("ascii", "replace") if toks else f"seq{index}"

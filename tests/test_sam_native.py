"""Differential test: the C record formatter (native/samemit.cpp) must
be byte-identical to the Python assembly loop in sam_single_records,
across varlen reads, quality strings, multi-hit/secondary records,
unmapped reads, boundary-spanning drops, and return_blocks mode."""

import importlib

import numpy as np
import pytest

import tpufm.io.sam as sam_mod
from tpufm.io.contigs import ContigMap


def _mk_case(rng, B, Lmax, H, ncontig, varlen, quals, codes_len):
    codes = rng.integers(0, 4, codes_len, dtype=np.uint8)
    cuts = np.sort(rng.choice(
        np.arange(1, codes_len), size=ncontig - 1, replace=False
    )) if ncontig > 1 else np.array([], np.int64)
    cmap = ContigMap(
        names=[f"ctg{i}" for i in range(ncontig)],
        starts=np.concatenate([[0], cuts]).astype(np.int64),
        total=codes_len,
    )
    if varlen:
        lengths = rng.integers(8, Lmax + 1, B)
        reads = np.full((B, Lmax), 0xFF, np.uint8)
        for i, L in enumerate(lengths):
            reads[i, Lmax - L:] = rng.integers(0, 4, L, dtype=np.uint8)
    else:
        lengths = None
        reads = rng.integers(0, 4, (B, Lmax), dtype=np.uint8)

    def posrow():
        pos = np.full((B, H), 0xFFFFFFFF, np.uint32)
        nhit = rng.integers(0, H + 1, B)
        for i in range(B):
            pos[i, : nhit[i]] = rng.integers(0, codes_len, nhit[i])
        return pos

    names = [f"read/{i}" for i in range(B)]
    q = (
        ["".join(chr(33 + (j + i) % 60) for j in range(
            int(lengths[i]) if varlen else Lmax)) if i % 5 else None
         for i in range(B)]
        if quals else None
    )
    return dict(
        names=names, reads=reads, pos_fwd=posrow(), pos_rc=posrow(),
        cmap=cmap, lengths=lengths, quals=q,
    ), codes


@pytest.mark.parametrize("varlen,quals,with_codes,blocks", [
    (False, False, False, False),
    (False, True, True, False),
    (True, True, False, True),
    (True, False, True, True),
    (False, False, True, True),
])
def test_native_matches_python(monkeypatch, rng, varlen, quals,
                               with_codes, blocks):
    if sam_mod._get_emitter() is None:
        pytest.skip("native emitter unavailable")
    kw, codes = _mk_case(rng, B=97, Lmax=36, H=5, ncontig=3,
                         varlen=varlen, quals=quals, codes_len=5000)
    if with_codes:
        kw["codes"] = codes
    native = sam_mod.sam_single_records(**kw, return_blocks=blocks)
    # force the Python loop
    monkeypatch.setattr(sam_mod, "_emit_lib", None)
    monkeypatch.setattr(sam_mod, "_emit_tried", True)
    py = sam_mod.sam_single_records(**kw, return_blocks=blocks)
    assert native == py


def test_native_survives_h_overflow_guard(rng, monkeypatch):
    """H beyond the C site-buffer bound silently takes the Python path
    (correctness over speed)."""
    if sam_mod._get_emitter() is None:
        pytest.skip("native emitter unavailable")
    kw, _ = _mk_case(rng, B=3, Lmax=12, H=300, ncontig=1,
                     varlen=False, quals=False, codes_len=2000)
    out = sam_mod.sam_single_records(**kw)
    monkeypatch.setattr(sam_mod, "_emit_lib", None)
    monkeypatch.setattr(sam_mod, "_emit_tried", True)
    assert out == sam_mod.sam_single_records(**kw)

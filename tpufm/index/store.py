"""Genome-scale native persistence: a directory of raw, mmap-able arrays.

The reference's index files load with one fread in seconds
(reference src/fmIndexCPUBaseline.c:71-143); tpufm's `.npz` path
(np.savez_compressed) cannot do that for a 6+ GB genome table. This store
writes each array as an uncompressed `.npy` (disk-speed save) plus a small
`meta.json`, and loads with `np.load(mmap_mode="r")` — opening the store is
O(1); pages stream from disk on first use (e.g. during the device upload),
so `tpufm search`/`locate` start from a prebuilt genome index with no
decompression and no rebuild.

Layout of `<name>.tpufm/`:
    meta.json            kind, format version, config, scalars
    occ.npy bitmaps.npy dollar_pos.npy dollar_base.npy        (kstep)
    + occ_slim.npy                                            (alt-counters)
    + lf1 arrays prefixed `lf1_` and mark_words/mark_rank/samples  (locate)
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from tpufm.config import IndexConfig, Layout
from tpufm.index.builder import KStepFMIndex

FORMAT = 1


def _save_arrays(root: Path, arrays: dict, prefix: str = "") -> None:
    for name, arr in arrays.items():
        np.save(root / f"{prefix}{name}.npy", np.ascontiguousarray(arr))


def _load_arrays(root: Path, names, mmap: bool, prefix: str = "") -> dict:
    mode = "r" if mmap else None
    return {n: np.load(root / f"{prefix}{n}.npy", mmap_mode=mode) for n in names}


def _kstep_meta(index: KStepFMIndex) -> dict:
    return {
        "k": index.config.k,
        "d": index.config.d,
        "layout": index.config.layout.value,
        "bwtsize": index.bwtsize,
    }


def _kstep_from(meta: dict, arrays: dict) -> KStepFMIndex:
    return KStepFMIndex(
        config=IndexConfig(
            k=meta["k"], d=meta["d"], layout=Layout(meta["layout"])
        ),
        bwtsize=meta["bwtsize"],
        occ=arrays["occ"],
        bitmaps=arrays["bitmaps"],
        dollar_pos=np.asarray(arrays["dollar_pos"]),
        dollar_base=np.asarray(arrays["dollar_base"]),
    )


_KSTEP_ARRAYS = ("occ", "bitmaps", "dollar_pos", "dollar_base")


def save_store(path, index) -> Path:
    """Persist a KStepFMIndex, AltCountersIndex, or LocateIndex as a
    `<path>.tpufm/` directory (created; `.tpufm` appended if missing)."""
    from tpufm.index.layouts import AltCountersIndex
    from tpufm.index.locate import LocateIndex

    root = Path(str(path) if str(path).endswith(".tpufm") else f"{path}.tpufm")
    root.mkdir(parents=True, exist_ok=True)

    if isinstance(index, AltCountersIndex):
        meta = {"kind": "alt_counters", "format": FORMAT, **_kstep_meta(index.base)}
        _save_arrays(
            root,
            {
                **{n: getattr(index.base, n) for n in _KSTEP_ARRAYS},
                "occ_slim": index.occ_slim,
            },
        )
    elif isinstance(index, LocateIndex):
        meta = {
            "kind": "locate",
            "format": FORMAT,
            "sample_rate": index.sample_rate,
            **{f"lf1_{k}": v for k, v in _kstep_meta(index.lf1).items()},
        }
        _save_arrays(root, {n: getattr(index.lf1, n) for n in _KSTEP_ARRAYS}, "lf1_")
        _save_arrays(
            root,
            {
                "mark_words": index.mark_words,
                "mark_rank": index.mark_rank,
                "samples": index.samples,
            },
        )
    elif isinstance(index, KStepFMIndex):
        meta = {"kind": "kstep", "format": FORMAT, **_kstep_meta(index)}
        _save_arrays(root, {n: getattr(index, n) for n in _KSTEP_ARRAYS})
    else:
        raise TypeError(f"cannot store {type(index).__name__}")

    (root / "meta.json").write_text(json.dumps(meta, indent=1))
    return root


def load_store(path, mmap: bool = True):
    """Load a `.tpufm` store. mmap=True (default) memory-maps every array:
    opening a 6 GB genome index is instant, pages stream on first use."""
    from tpufm.index.layouts import AltCountersIndex
    from tpufm.index.locate import LocateIndex

    root = Path(str(path) if str(path).endswith(".tpufm") else f"{path}.tpufm")
    meta = json.loads((root / "meta.json").read_text())
    if meta.get("format", 0) > FORMAT:
        raise ValueError(
            f"store format {meta['format']} is newer than supported ({FORMAT})"
        )

    kind = meta["kind"]
    if kind == "kstep":
        return _kstep_from(meta, _load_arrays(root, _KSTEP_ARRAYS, mmap))
    if kind == "alt_counters":
        arrays = _load_arrays(root, _KSTEP_ARRAYS + ("occ_slim",), mmap)
        return AltCountersIndex(
            base=_kstep_from(meta, arrays), occ_slim=arrays["occ_slim"]
        )
    if kind == "locate":
        lf1 = _kstep_from(
            {k[4:]: v for k, v in meta.items() if k.startswith("lf1_")},
            _load_arrays(root, _KSTEP_ARRAYS, mmap, "lf1_"),
        )
        aux = _load_arrays(root, ("mark_words", "mark_rank", "samples"), mmap)
        return LocateIndex(
            lf1=lf1,
            sample_rate=meta["sample_rate"],
            mark_words=aux["mark_words"],
            mark_rank=aux["mark_rank"],
            samples=aux["samples"],
        )
    raise ValueError(f"unknown store kind {kind!r}")

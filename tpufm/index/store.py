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


def save_store_sharded(path, index) -> Path:
    """Persist a KStepFMIndex whose occ/bitmaps are GLOBAL SHARDED
    jax.Arrays (build_index_sharded return_host=False) WITHOUT ever
    assembling the table on one host: every process writes one raw
    `.npy` per shard it holds (`occ.shard0007.npy`, ...), so an index
    larger than any single host's RAM can still be persisted. Process 0
    writes meta.json + the replicated dollar arrays. Closes the
    docs/DISTRIBUTED.md "persistence of device-resident sharded tables"
    gap; the reference's persistence story is a single whole-table fread
    (src/fmIndexCPUBaseline.c:71-143) with no >RAM mode at all."""
    import jax

    occ, bitmaps = index.occ, index.bitmaps
    # a 1-device mesh is trivially "fully replicated" yet perfectly valid
    # as a single-shard store; the guard targets replicated MULTI-device
    # tables, where every process would write overlapping whole copies
    if not isinstance(occ, jax.Array) or (
        occ.is_fully_replicated and occ.sharding.num_devices > 1
    ):
        raise TypeError(
            "save_store_sharded expects row-sharded device tables "
            "(build_index_sharded(..., return_host=False)); use "
            "save_store for host/replicated indexes"
        )
    root = Path(str(path) if str(path).endswith(".tpufm") else f"{path}.tpufm")
    root.mkdir(parents=True, exist_ok=True)

    n_shards = occ.sharding.num_devices
    rows = occ.shape[0]
    if rows % n_shards:
        raise ValueError(f"row count {rows} not a multiple of {n_shards}")
    shard_len = rows // n_shards
    for arr, name in ((occ, "occ"), (bitmaps, "bitmaps")):
        for sh in arr.addressable_shards:
            # a 1-device shard's index is a full slice (start None)
            sid = (sh.index[0].start or 0) // shard_len
            np.save(root / f"{name}.shard{sid:04d}.npy", np.asarray(sh.data))
    if jax.process_index() == 0:
        _save_arrays(
            root,
            {
                "dollar_pos": np.asarray(jax.device_get(index.dollar_pos)),
                "dollar_base": np.asarray(jax.device_get(index.dollar_base)),
            },
        )
        meta = {
            "kind": "kstep_sharded",
            "format": FORMAT,
            "n_shards": n_shards,
            "rows": rows,
            **_kstep_meta(index),
        }
        (root / "meta.json").write_text(json.dumps(meta, indent=1))
    return root


def load_store_sharded(path, mesh, axis: str | None = None):
    """Reassemble a per-shard store onto `mesh` with no full-table host
    copy: each process memory-maps ONLY the shard files of its
    addressable devices, uploads them, and the global sharded array is
    stitched with jax.make_array_from_single_device_arrays. The mesh
    must have as many devices as the store has shards (the shard is the
    unit of placement). Returns a KStepFMIndex whose occ/bitmaps are
    global sharded jax.Arrays — feed it straight to ShardedIndexEngine."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    root = Path(str(path) if str(path).endswith(".tpufm") else f"{path}.tpufm")
    meta = json.loads((root / "meta.json").read_text())
    if meta.get("format", 0) > FORMAT:
        raise ValueError(
            f"store format {meta['format']} is newer than supported ({FORMAT})"
        )
    if meta["kind"] != "kstep_sharded":
        raise ValueError(f"not a sharded store: kind={meta['kind']!r}")
    n_shards, rows = meta["n_shards"], meta["rows"]
    if mesh.devices.size != n_shards:
        raise ValueError(
            f"store has {n_shards} shards; mesh has {mesh.devices.size} "
            "devices (per-shard stores reload onto an equal-size mesh)"
        )
    axis = axis or mesh.axis_names[0]
    shard_len = rows // n_shards

    def stitch(name, tail_shape):
        sharding = NamedSharding(
            mesh, PartitionSpec(axis, *([None] * len(tail_shape)))
        )
        shape = (rows, *tail_shape)
        bufs = []
        for dev, idx in sharding.addressable_devices_indices_map(shape).items():
            # a 1-device mesh's index is a full slice (start None)
            sid = (idx[0].start or 0) // shard_len
            arr = np.load(root / f"{name}.shard{sid:04d}.npy", mmap_mode="r")
            bufs.append(jax.device_put(arr, dev))
        return jax.make_array_from_single_device_arrays(shape, sharding, bufs)

    k, nb = meta["k"], meta["d"] // 32
    arrays = {
        "occ": stitch("occ", (4**k,)),
        "bitmaps": stitch("bitmaps", (k, 2, nb)),
        **_load_arrays(root, ("dollar_pos", "dollar_base"), mmap=False),
    }
    return _kstep_from(meta, arrays)


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
    if kind == "kstep_sharded":
        raise ValueError(
            "per-shard store: load with tpufm.index.store."
            "load_store_sharded(path, mesh) onto an equal-size mesh"
        )
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

"""Resumable query-stream search.

The reference's batch jobs restart from zero on failure (SURVEY.md section
5: no mid-run checkpointing). tpufm streams big read sets through the
device in fixed-size waves anyway, so checkpointing falls out naturally:
each completed wave's [W, 2] intervals append to a raw `.partial` file
next to a JSON sidecar recording progress; a crashed/killed run re-invoked
with the same arguments skips the finished waves and continues. On
completion the partial file holds exactly num_queries rows and is
converted to the final result format.

The sidecar carries a content fingerprint (CRC32 of the query bytes plus
the engine's k/d/bwtsize identity), so re-invoking against a different
query set or index of the same size restarts from zero instead of splicing
stale waves into the result.
"""

from __future__ import annotations

import json
import os
import time
import zlib
from pathlib import Path

import numpy as np

from tpufm.utils.waves import pad_cycle


def _fingerprint(engine, queries: np.ndarray) -> int:
    """CRC32 of the query bytes and the engine's index identity."""
    crc = zlib.crc32(np.ascontiguousarray(queries))
    cfg = getattr(engine, "config", None)
    ident = (
        getattr(engine, "bwtsize", 0),
        getattr(cfg, "k", 0),
        getattr(cfg, "d", 0),
    )
    return zlib.crc32(repr(ident).encode(), crc)


def _default_wave(engine) -> int:
    """The engine's natural wave size; sharded engines expose a per-chip
    wave that scales with the mesh."""
    per_chip = getattr(engine, "WAVE_PER_CHIP", None)
    if per_chip is not None:
        return per_chip * engine.mesh.devices.size
    return getattr(engine, "WAVE", 1 << 20)


def search_resumable(
    engine,
    queries: np.ndarray,
    out_path,
    wave: int | None = None,
    stats: dict | None = None,
) -> np.ndarray:
    """Stream `queries` through engine.search wave by wave, checkpointing
    to <out_path>.partial/.progress. Returns the full uint32 [B, 2] result
    (re-reading previously completed waves from the checkpoint).

    If `stats` is given, stats['search_s'] accumulates the pure search
    seconds of this invocation (checkpoint fsync/serialization excluded) —
    the number the TIME: protocol should report.
    """
    return _stream_resumable(
        lambda chunk: np.asarray(engine.search(chunk), dtype=np.uint32),
        engine, queries, out_path, 2, wave, stats,
    )


def locate_resumable(
    engine,
    queries: np.ndarray,
    out_path,
    wave: int | None = None,
    stats: dict | None = None,
) -> np.ndarray:
    """Positions twin of search_resumable: `engine` is a fused
    search+locate engine (SearchLocateEngine or DataParallelSearchLocate);
    each completed wave checkpoints its uint32 [W, engine.max_hits]
    position rows, so a killed genome-scale locate run re-invoked with the
    same arguments continues where it stopped. Row width comes from the
    engine itself (a redundant parameter could silently disagree)."""
    return _stream_resumable(
        lambda chunk: np.ascontiguousarray(
            np.asarray(engine.search_locate(chunk)[1], dtype=np.uint32)
        ),
        engine, queries, out_path, engine.max_hits, wave, stats,
    )


def _stream_resumable(run, engine, queries, out_path, row_words, wave, stats):
    """Shared wave-checkpointed driver: run(chunk) -> uint32
    [len(chunk), row_words]; rows append to .partial with an atomic
    .progress sidecar (fingerprinted, torn-JSON safe)."""
    wave = wave or _default_wave(engine)
    mesh = getattr(engine, "mesh", None)
    n_dev = mesh.devices.size if mesh is not None else 1
    if n_dev > 1:
        # Mesh engines require batch % n_dev == 0: round the wave down to a
        # mesh multiple and pad the tail chunk up to one (trimmed below).
        wave = max(n_dev, wave - wave % n_dev)
    out_path = Path(out_path)
    part = out_path.with_suffix(out_path.suffix + ".partial")
    prog = out_path.with_suffix(out_path.suffix + ".progress")

    B = queries.shape[0]
    row_bytes = 4 * row_words
    n_waves = -(-B // wave)
    fp_now = zlib.crc32(
        repr(row_words).encode(), _fingerprint(engine, queries)
    )
    state = {"total": B, "wave": wave, "done_waves": 0, "fingerprint": fp_now}
    if prog.exists() and part.exists():
        try:
            prev = json.loads(prog.read_text())
        except (json.JSONDecodeError, OSError):
            prev = {}  # torn sidecar (crash mid-write): restart from zero
        if (
            prev.get("total") == B
            and prev.get("wave") == wave
            and prev.get("fingerprint") == fp_now
            and 0 < prev.get("done_waves", 0) <= n_waves
            and part.stat().st_size
            == min(prev["done_waves"] * wave, B) * row_bytes
        ):
            state = prev

    search_s = 0.0
    start_wave = state["done_waves"]
    mode = "r+b" if start_wave else "wb"
    with open(part, mode) as fp:
        fp.seek(min(start_wave * wave, B) * row_bytes)
        for w in range(start_wave, n_waves):
            lo = w * wave
            chunk = queries[lo : lo + wave]
            if n_dev > 1 and chunk.shape[0] % n_dev:
                # Pad the tail to a mesh multiple by cycling the wave's own
                # reads (matches real traffic statistics); trim the answers.
                real = chunk.shape[0]
                pad = -real % n_dev
                chunk = pad_cycle(chunk, pad)
                t0 = time.perf_counter()
                res = run(chunk)[:real]
                search_s += time.perf_counter() - t0
            else:
                t0 = time.perf_counter()
                res = run(chunk)
                search_s += time.perf_counter() - t0
            fp.write(np.ascontiguousarray(res).tobytes())
            fp.flush()
            os.fsync(fp.fileno())
            state["done_waves"] = w + 1
            # atomic sidecar update: a crash mid-write must leave either the
            # old or the new progress file, never torn JSON
            tmp = prog.with_suffix(prog.suffix + ".tmp")
            tmp.write_text(json.dumps(state))
            os.replace(tmp, prog)

    if stats is not None:
        stats["search_s"] = search_s
    out = np.fromfile(part, dtype=np.uint32).reshape(B, row_words)
    part.unlink()
    prog.unlink()
    return out

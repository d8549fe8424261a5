"""Resumable query-stream search.

The reference's batch jobs restart from zero on failure (SURVEY.md section
5: no mid-run checkpointing). tpufm streams big read sets through the
device in fixed-size waves anyway, so checkpointing falls out naturally:
each completed wave's [W, 2] intervals append to a raw `.partial` file
next to a JSON sidecar recording progress; a crashed/killed run re-invoked
with the same arguments skips the finished waves and continues. On
completion the partial file holds exactly num_queries rows and is
converted to the final result format.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np


def search_resumable(
    engine,
    queries: np.ndarray,
    out_path,
    wave: int | None = None,
) -> np.ndarray:
    """Stream `queries` through engine.search wave by wave, checkpointing
    to <out_path>.partial/.progress. Returns the full uint32 [B, 2] result
    (re-reading previously completed waves from the checkpoint)."""
    wave = wave or getattr(engine, "WAVE", 1 << 20)
    out_path = Path(out_path)
    part = out_path.with_suffix(out_path.suffix + ".partial")
    prog = out_path.with_suffix(out_path.suffix + ".progress")

    B = queries.shape[0]
    n_waves = -(-B // wave)
    state = {"total": B, "wave": wave, "done_waves": 0}
    if prog.exists() and part.exists():
        try:
            prev = json.loads(prog.read_text())
        except (json.JSONDecodeError, OSError):
            prev = {}  # torn sidecar (crash mid-write): restart from zero
        if (
            prev.get("total") == B
            and prev.get("wave") == wave
            and 0 < prev.get("done_waves", 0) <= n_waves
            and part.stat().st_size
            == min(prev["done_waves"] * wave, B) * 8
        ):
            state = prev

    start_wave = state["done_waves"]
    mode = "r+b" if start_wave else "wb"
    with open(part, mode) as fp:
        fp.seek(min(start_wave * wave, B) * 8)
        for w in range(start_wave, n_waves):
            lo = w * wave
            chunk = queries[lo : lo + wave]
            res = np.asarray(engine.search(chunk), dtype=np.uint32)
            fp.write(np.ascontiguousarray(res).tobytes())
            fp.flush()
            os.fsync(fp.fileno())
            state["done_waves"] = w + 1
            # atomic sidecar update: a crash mid-write must leave either the
            # old or the new progress file, never torn JSON
            tmp = prog.with_suffix(prog.suffix + ".tmp")
            tmp.write_text(json.dumps(state))
            os.replace(tmp, prog)

    out = np.fromfile(part, dtype=np.uint32).reshape(B, 2)  # writable copy
    part.unlink()
    prog.unlink()
    return out

"""Multi-chip locate — sampled-SA position resolution scaled over a mesh.

DataParallelLocate replicates the locate tables per chip (they are small
next to the search index: the k=1 LF rows + mark words + samples for a
3 Gbase genome at s=32 are ~2.3 GB, and shrink linearly with sample_rate)
and shards the BWT-row batch along the mesh's batch axis — the same SPMD
shape as DataParallelEngine, so locate throughput scales like search
throughput. The per-row walk is independent, so the only collective is the
all-gather of the resolved positions (4 B/row) at the exit sharding.

The reference has no locate at all (it reports interval counts only,
SURVEY.md section 0); tpufm made locate first-class (tpufm/index/locate.py),
so it scales first-class too.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufm.engine.xla import build_locate_tables, make_locate_fn
from tpufm.parallel.search import put_global


class DataParallelLocate:
    """Replicated-table, row-sharded locate over a 1-D device mesh."""

    #: rows per chip per wave (total wave = WAVE_PER_CHIP * n_dev) — the
    #: same constant-device-memory streaming as the single-chip engine
    WAVE_PER_CHIP = 1 << 18

    def __init__(self, loc, mesh: Mesh):
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        repl = NamedSharding(mesh, P())
        put = functools.partial(put_global, sharding=repl)
        self.tables, self.d, self.sample_rate = build_locate_tables(loc, put)
        self.rows_sharding = NamedSharding(mesh, P(self.axis))
        self._locate = jax.jit(
            make_locate_fn(self.d, self.sample_rate), out_shardings=repl
        )

    def place_rows(self, rows) -> jax.Array:
        """Place a uint32 [N] row batch sharded along the mesh's batch axis
        (N must be a mesh multiple)."""
        return put_global(np.asarray(rows, np.uint32), self.rows_sharding)

    def locate_device(self, rows_sharded):
        """Device-resident dispatch (no host sync) — benchmarking entry."""
        return self._locate(self.tables, rows_sharded)

    def locate_rows(self, rows, wave: int | None = None) -> np.ndarray:
        """BWT rows uint32 [N] -> SA values uint32 [N]. N is padded to a
        mesh multiple (row 0 is always valid) and trimmed; batches beyond
        `wave` stream in fixed-shape waves, pipelined 2 deep."""
        from tpufm.utils.waves import stream_waves

        n = self.mesh.devices.size
        rows = np.asarray(rows, dtype=np.uint32)
        N = rows.shape[0]
        pad = -N % n
        if pad:
            rows = np.concatenate([rows, np.zeros(pad, np.uint32)])
        wave = wave or self.WAVE_PER_CHIP * n
        wave -= wave % n
        out = stream_waves(
            rows,
            max(wave, n),
            lambda r: self._locate(
                self.tables, put_global(r, self.rows_sharding)
            ),
            lambda h: np.asarray(jax.device_get(h)),
            depth=2,
        )
        return out[:N]

    def locate_hits(self, intervals, max_hits: int) -> np.ndarray:
        """uint32 [B, 2] search intervals -> uint32 [B, max_hits] text
        positions, padded with 0xFFFFFFFF past each interval's count."""
        from tpufm.index.locate import expand_intervals

        rows, valid = expand_intervals(intervals, max_hits)
        pos = self.locate_rows(rows.reshape(-1)).reshape(rows.shape)
        return np.where(valid, pos, np.uint32(0xFFFFFFFF))

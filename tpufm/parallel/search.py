"""Multi-chip search engines.

DataParallelEngine — index tables replicated per chip, query batch sharded
along the batch axis of a 1-D mesh; the jitted program is pure SPMD data
parallelism and the per-read (lo, hi) results are merged with one all-gather
at the end (8 bytes per read over ICI). This is the scaling mode for indexes
that fit in HBM (human genome @ k=2, d=64 is ~3.2 GB).

ShardedIndexEngine — for indexes exceeding a chip's HBM: the entry table is
sharded along the block axis; every LF round, each chip all-gathers the
(block, code, interval) requests of all chips (12 B per interval end),
answers the ones whose entry lives in its shard, and a psum combines the
partial answers. Collectives ride ICI; compute stays the same VPU
mask/popcount. (The reference has no counterpart — its cluster scripts run
independent processes; SURVEY.md section 5 'distributed communication
backend: none'.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufm.engine.xla import (
    _boundary_masks,
    _match_words,
    fuse_round_codes,
    make_search_fn,
)
from tpufm.index.builder import KStepFMIndex
from tpufm.index.layouts import AltCountersIndex

_U32 = jnp.uint32


def _pvary(x, axis):
    """Mark x device-varying along a mesh axis (API moved across JAX 0.8/0.9)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis, to="varying")
    return jax.lax.pvary(x, (axis,))


def _shard_map():
    if hasattr(jax, "shard_map"):
        return jax.shard_map
    from jax.experimental.shard_map import shard_map

    return shard_map


def put_global(x, sharding):
    """Place a host array with `sharding` — multi-process safe.

    Single process: plain device_put. Multi-process (jax.distributed): every
    process holds the same full host array and contributes its addressable
    shards via make_array_from_callback — the standard SPMD bring-up for
    replicated tables and batch-sharded queries on multi-host slices."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


class DataParallelEngine:
    """Replicated-index, batch-sharded search over a 1-D device mesh.

    lut_m > 0 additionally replicates a 4^lut_m x 2 prefix LUT (built once,
    on device) so every chip starts its query shard lut_m characters in —
    same round elimination as the single-chip engine."""

    def __init__(
        self,
        index: KStepFMIndex | AltCountersIndex,
        mesh: Mesh,
        lut_m: int = 0,
        lut_cache: str | None = None,
        pad_words: int | None = None,
    ):
        if isinstance(index, AltCountersIndex):
            base, self.alt_counters = index.base, True
        else:
            base, self.alt_counters = index, False
        if lut_m and (self.alt_counters or lut_m % base.config.k):
            raise ValueError("lut_m requires the fused layout and lut_m % k == 0")
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.config = base.config
        self.bwtsize = base.bwtsize

        replicated = NamedSharding(mesh, P())
        put = functools.partial(put_global, sharding=replicated)
        tables = {
            "dollar_pos": put(base.dollar_pos),
            "dollar_base": put(base.dollar_base),
            "dollar_block": put(np.asarray(base.dollar_block, dtype=np.uint32)),
        }
        layout = "split" if self.alt_counters else "fused"
        if layout == "fused":
            from tpufm.engine.xla import build_fused_entries

            tables["entries"] = put(build_fused_entries(base, pad_words))
        else:
            tables["bitmaps"] = put(base.bitmaps)
            tables["occ_slim"] = put(index.occ_slim)
        self.tables = tables

        if lut_m:
            from tpufm.engine.xla import lut_with_cache

            tables["lut"] = lut_with_cache(tables, base, lut_m, lut_cache, put)

        self.batch_sharding = NamedSharding(mesh, P(self.axis, None))
        search = make_search_fn(
            self.config.k,
            self.config.d,
            self.alt_counters,
            layout=layout,
            lut_m=lut_m,
        )
        # Results replicated on exit: the all-gather merge of the per-chip
        # (lo, hi) shards.
        self._search = jax.jit(
            search, out_shardings=NamedSharding(mesh, P())
        )

    def shard_queries(self, queries) -> jax.Array:
        """Place a [B, L] uint8 batch sharded along the mesh's batch axis.
        B must divide evenly by the mesh size (pad the tail batch)."""
        n = self.mesh.devices.size
        if queries.shape[0] % n:
            raise ValueError(
                f"batch {queries.shape[0]} not divisible by mesh size {n}; pad it"
            )
        return put_global(np.asarray(queries, np.uint8), self.batch_sharding)

    def search(self, queries) -> np.ndarray:
        out = self._search(self.tables, _U32(self.bwtsize), self.shard_queries(queries))
        return np.asarray(jax.device_get(out))

    def search_device(self, queries_sharded):
        return self._search(self.tables, _U32(self.bwtsize), queries_sharded)


def _answer_owned(
    occ_shard, bitmaps_shard, dollar, cfg, my_shard, g_block, g_code, g_interval
):
    """Answer the LF lookups whose entry lives in this chip's shard; zero for
    the rest. Shared by both sharded routings so they cannot diverge."""
    k, d, nb, e_local = cfg
    dpos, dbase, dblock = dollar

    owner = g_block // _U32(e_local)
    local_idx = jnp.where(owner == my_shard, g_block - my_shard * _U32(e_local), 0)

    cnt = occ_shard[local_idx, g_code]
    rows = bitmaps_shard[local_idx]
    masks = _boundary_masks(g_interval % _U32(d), nb)
    matched = _match_words(rows, g_code, k) & masks
    count = jnp.sum(jax.lax.population_count(matched), axis=-1)

    hit = (
        (g_block[..., None] == dblock)
        & (g_code[..., None] == dbase)
        & (g_interval[..., None] > dpos)
    )
    count -= jnp.sum(hit.astype(_U32), axis=-1)
    return jnp.where(owner == my_shard, cnt + count, _U32(0))


def _sharded_lf_step(occ_shard, bitmaps_shard, dollar, cfg, axis, interval, code):
    """One LF round with the entry table sharded along the block axis.

    occ_shard: [E_local, 4^k]; bitmaps_shard: [E_local, k, 2, nb] — this
    chip's contiguous slice of entries. interval/code: [B_local] (this chip's
    query shard). Requests are all-gathered, answered by the owning shard,
    and psum-combined.
    """
    d = cfg[1]
    block = interval // _U32(d)
    # All-gather this round's requests from every chip: [D, B_local, 3]
    req = jnp.stack([block, code, interval], axis=-1)
    all_req = jax.lax.all_gather(req, axis)  # [D, B_local, 3]
    D, Bl, _ = all_req.shape
    flat = all_req.reshape(D * Bl, 3)

    my_shard = jax.lax.axis_index(axis).astype(_U32)
    answer = _answer_owned(
        occ_shard, bitmaps_shard, dollar, cfg, my_shard,
        flat[:, 0], flat[:, 1], flat[:, 2],
    )
    combined = jax.lax.psum(answer.reshape(D, Bl), axis)  # [D, B_local]
    return combined[jax.lax.axis_index(axis)]


def _sharded_lf_step_ring(occ_shard, bitmaps_shard, dollar, cfg, axis, interval, code):
    """One LF round with ring routing: the (request, partial-answer) block
    ppermutes around the mesh ring; each hop a chip answers the requests
    whose entry lives in its shard. D hops of B_local x 16 B traffic instead
    of one D x B_local all-gather — same total bytes, but per-chip peak
    memory stays O(B_local) (the point of this mode is capacity; SURVEY.md
    section 7 'sharded the entry table ... route lookups with ppermute')."""
    d = cfg[1]
    n_dev = jax.lax.axis_size(axis)
    my_shard = jax.lax.axis_index(axis).astype(_U32)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    block = interval // _U32(d)

    def answer_owned(g_block, g_code, g_interval):
        return _answer_owned(
            occ_shard, bitmaps_shard, dollar, cfg, my_shard,
            g_block, g_code, g_interval,
        )

    req = jnp.stack([block, code, interval], axis=-1)  # [B_local, 3]
    ans = answer_owned(block, code, interval)

    def hop(_, carry):
        req, ans = carry
        req = jax.lax.ppermute(req, axis, perm)
        ans = jax.lax.ppermute(ans, axis, perm)
        ans = ans + answer_owned(req[:, 0], req[:, 1], req[:, 2])
        return req, ans

    req, ans = jax.lax.fori_loop(0, n_dev - 1, hop, (req, ans))
    # one final rotation brings each chip's answers home
    return jax.lax.ppermute(ans, axis, perm)


class ShardedIndexEngine:
    """Entry-table-sharded search for indexes larger than one chip's HBM.

    routing="allgather" (default): every chip all-gathers all requests,
    answers its own, psum combines. routing="ring": requests ppermute around
    the ring, O(B_local) peak memory per chip."""

    def __init__(self, index: KStepFMIndex, mesh: Mesh, routing: str = "allgather"):
        if isinstance(index, AltCountersIndex):
            raise NotImplementedError(
                "sharded-index mode uses the baseline counter layout"
            )
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.config = index.config
        self.bwtsize = index.bwtsize
        n_dev = mesh.devices.size

        # Pad entry rows so every shard holds the same count; the sentinel
        # row rides along inside the padded region.
        total = index.occ.shape[0]
        e_local = -(-total // n_dev)
        pad = e_local * n_dev - total
        occ = np.pad(index.occ, ((0, pad), (0, 0)))
        bitmaps = np.pad(index.bitmaps, ((0, pad), (0, 0), (0, 0), (0, 0)))
        self.e_local = e_local

        shard_rows = NamedSharding(mesh, P(self.axis))
        repl = NamedSharding(mesh, P())
        self.occ = jax.device_put(occ, shard_rows)
        self.bitmaps = jax.device_put(bitmaps, shard_rows)
        self.dollar = (
            jax.device_put(index.dollar_pos, repl),
            jax.device_put(index.dollar_base, repl),
            jax.device_put(np.asarray(index.dollar_block, np.uint32), repl),
        )

        if routing not in ("allgather", "ring"):
            raise ValueError(f"unknown routing {routing!r}")
        step = _sharded_lf_step if routing == "allgather" else _sharded_lf_step_ring
        k, d = self.config.k, self.config.d
        cfg = (k, d, self.config.words_per_plane, e_local)
        axis = self.axis

        def search_local(occ_shard, bitmaps_shard, dollar, bwtsize, queries):
            codes = fuse_round_codes(queries, k)
            B = queries.shape[0]
            # The carry is device-varying inside shard_map; mark it so.
            lo0 = _pvary(jnp.zeros(B, dtype=_U32), axis)
            hi0 = _pvary(jnp.full(B, bwtsize, dtype=_U32), axis)

            def body(carry, code):
                # Stack both interval ends into ONE request block per round:
                # half the collective launches (one all_gather+psum or one
                # ring circulation instead of two) for the same payload.
                lo, hi = carry
                iv = jnp.concatenate([lo, hi])
                code2 = jnp.concatenate([code, code])
                iv = step(occ_shard, bitmaps_shard, dollar, cfg, axis, iv, code2)
                return (iv[:B], iv[B:]), None

            (lo, hi), _ = jax.lax.scan(body, (lo0, hi0), codes)
            return jnp.stack([lo, hi], axis=1)

        shard_map = _shard_map()

        self._search = jax.jit(
            shard_map(
                search_local,
                mesh=mesh,
                in_specs=(P(axis), P(axis), (P(), P(), P()), P(), P(axis, None)),
                out_specs=P(axis, None),
            )
        )

    def search(self, queries) -> np.ndarray:
        n = self.mesh.devices.size
        if queries.shape[0] % n:
            raise ValueError(f"batch not divisible by mesh size {n}")
        q = jax.device_put(
            jnp.asarray(queries, jnp.uint8),
            NamedSharding(self.mesh, P(self.axis, None)),
        )
        out = self._search(
            self.occ, self.bitmaps, self.dollar, _U32(self.bwtsize), q
        )
        return np.asarray(jax.device_get(out))

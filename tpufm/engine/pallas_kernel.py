"""Pallas TPU kernels for the backward-search hot loop.

Division of labor (measured honestly on v5e, see docs/PERF.md):
  * the data-dependent entry gather is left to XLA — its gather runtime has
    a fast path a hand-rolled per-row DMA pipeline did not match;
  * the per-round rank computation (boundary masks, plane select/complement,
    AND-reduce, popcount, counter select, '$' corrections, interval update)
    is fused into ONE VPU kernel over the gathered rows — the tpufm
    counterpart of the reference's per-thread bit kernel
    (reference src/fmIndexGPU-Task-2Step.cu:103-122 / fmIndexCPUBaseline.c:230-256).

Honest standing (probes 83/84, docs/PERF.md "The Mosaic round body,
closed"): this engine measures ~0.5x the XLA engine at the d=192
flagship (1.07M vs 2.22M reads/s). The custom-call boundary forces the
gathered rows ([2B, W] — 800 MB/round at 1M-read waves) to MATERIALIZE
in HBM between the XLA gather and the kernel, traffic the pure-XLA
path's gather+consumer fusion never pays; no kernel-side win can buy
that back. It stays as the measured alternative formulation and the
only engine whose round body is hand-schedulable.

The kernel is layout-static (k, d baked at trace time, like everything else
in tpufm) and grid-tiled over the flattened 2B interval ends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufm.index.builder import KStepFMIndex

_U32 = jnp.uint32
_FULL = np.uint32(0xFFFFFFFF)


def _lf_round_kernel(
    dollar_ref,  # SMEM [3, k]: rows = dollar_pos, dollar_base, dollar_block
    rows_ref,    # VMEM [TILE, W]: gathered entries (bitmap words then counters)
    iv_ref,      # VMEM [TILE, 1]: interval ends
    code_ref,    # VMEM [TILE, 1]: fused k-mer codes
    out_ref,     # VMEM [TILE, 1]: updated interval ends
    *,
    k: int,
    d: int,
    nb: int,
    ncounters: int,
):
    bmw = 2 * k * nb
    iv = iv_ref[:, 0]
    code = code_ref[:, 0]
    block = iv // _U32(d)

    # Boundary prefix masks per 32-base window.
    shift = (iv % _U32(d)).astype(jnp.int32)[:, None]
    win = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    cov = jnp.clip(shift - 32 * win, 0, 32)
    amount = jnp.where(cov > 0, 32 - jnp.minimum(cov, 32), 0).astype(_U32)
    matched = jnp.where(cov > 0, jnp.left_shift(_U32(_FULL), amount), _U32(0))

    # Plane select/complement AND-reduce (static slices per level/plane).
    for i in range(k):
        b0 = ((code >> _U32(2 * i)) & _U32(1))[:, None]
        b1 = ((code >> _U32(2 * i + 1)) & _U32(1))[:, None]
        p0 = rows_ref[:, i * 2 * nb : i * 2 * nb + nb]
        p1 = rows_ref[:, i * 2 * nb + nb : i * 2 * nb + 2 * nb]
        matched &= jnp.where(b0 != 0, p0, ~p0) & jnp.where(b1 != 0, p1, ~p1)

    # Mosaic has no unsigned reductions: reduce in int32 (bit-identical here —
    # popcounts are small, and the one-hot row has a single non-zero).
    count = jnp.sum(
        jax.lax.population_count(matched).astype(jnp.int32), axis=1
    ).astype(_U32)

    # Counter select via the binary-tree halving of static slices — the
    # same formulation that won the XLA-side shootout (probe63,
    # docs/PERF.md "The counter pick, solved"): one code bit per level,
    # no iota compares, no lane reduction.
    cnt_cols = rows_ref[:, bmw : bmw + ncounters]
    bits = ncounters.bit_length() - 1
    for bit in reversed(range(bits)):
        half = cnt_cols.shape[1] // 2
        hi = ((code >> _U32(bit)) & _U32(1))[:, None] != 0
        cnt_cols = jnp.where(hi, cnt_cols[:, half:], cnt_cols[:, :half])
    cnt = cnt_cols[:, 0]

    # '$' corrections: scalar metadata from SMEM, k static.
    for i in range(k):
        dpos = dollar_ref[0, i]
        dbase = dollar_ref[1, i]
        dblock = dollar_ref[2, i]
        hit = (block == dblock) & (code == dbase) & (iv > dpos)
        count -= hit.astype(_U32)

    out_ref[:, 0] = cnt + count


def make_lf_round(k: int, d: int, tile: int = 2048, interpret: bool = False):
    """Returns lf_round(rows [N, W], intervals [N], codes [N], dollar [3, k])
    -> new intervals [N]; any N (the tail is padded to a tile multiple)."""
    nb = d // 32
    ncounters = 4**k
    w = 2 * k * nb + ncounters
    kernel = functools.partial(
        _lf_round_kernel, k=k, d=d, nb=nb, ncounters=ncounters
    )

    def lf_round(rows, intervals, codes, dollar):
        n = rows.shape[0]
        # Pad the flattened end-batch to a tile multiple: a floor grid would
        # silently leave the tail (or, for n < tile, ALL) outputs as garbage.
        pad = -n % tile
        if pad:
            rows = jnp.concatenate([rows, jnp.zeros((pad, w), _U32)])
            intervals = jnp.concatenate([intervals, jnp.zeros(pad, _U32)])
            codes = jnp.concatenate([codes, jnp.zeros(pad, _U32)])
        grid = ((n + pad) // tile,)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tile, w), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (tile, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((n + pad, 1), _U32),
            interpret=interpret,
        )(dollar, rows, intervals[:, None], codes[:, None])[:, 0]
        return out[:n] if pad else out

    return lf_round


def make_pallas_search_fn(
    k: int, d: int, tile: int = 2048, interpret: bool = False, lut_m: int = 0
):
    """Jittable batch search with XLA gathers + the Pallas round kernel.

    (tables, bwtsize, queries[B, L]) -> uint32 [B, 2], any B.
    lut_m > 0: start from the 4^lut_m x 2 prefix LUT in tables['lut']
    (see tpufm.engine.xla.make_search_fn).
    """
    from tpufm.engine.xla import fuse_prefix_codes, fuse_round_codes

    lf_round = make_lf_round(k, d, tile=tile, interpret=interpret)

    def search(tables, bwtsize, queries):
        B, L = queries.shape
        if lut_m:
            if (L - lut_m) % k:
                raise ValueError(
                    f"query length {L} minus lut_m {lut_m} not divisible by k={k}"
                )
            iv0 = tables["lut"][fuse_prefix_codes(queries, lut_m)]
            codes = fuse_round_codes(queries[:, : L - lut_m], k)
        else:
            codes = fuse_round_codes(queries, k)
            iv0 = jnp.stack(
                [jnp.zeros(B, dtype=_U32), jnp.full(B, bwtsize, dtype=_U32)],
                axis=1,
            )
        dollar = jnp.stack(
            [tables["dollar_pos"], tables["dollar_base"], tables["dollar_block"]]
        )
        entries = tables["entries"]

        def body(iv, code):
            block = iv // _U32(d)
            rows = entries[block]  # XLA gather [B, 2, W]
            flat_iv = iv.reshape(-1)
            flat_code = jnp.repeat(code[:, None], 2, axis=1).reshape(-1)
            new_iv = lf_round(
                rows.reshape(-1, rows.shape[-1]), flat_iv, flat_code, dollar
            )
            return new_iv.reshape(B, 2), None

        iv, _ = jax.lax.scan(body, iv0, codes)
        return iv

    return search


class PallasEngine:
    """XLAEngine twin whose per-round compute runs in the Pallas kernel."""

    def __init__(
        self,
        index: KStepFMIndex,
        tile: int = 2048,
        interpret: bool = False,
        lut_m: int = 0,
    ):
        from tpufm.index.layouts import AltCountersIndex

        if isinstance(index, AltCountersIndex):
            # The Pallas kernel consumes the baseline fused layout; intervals
            # are identical either way, so search the underlying base index.
            index = index.base
        if not interpret and jax.default_backend() == "cpu":
            # Mosaic compiles for TPU only; on the CPU backend (tests,
            # virtual meshes) the kernel runs in interpret mode transparently.
            interpret = True
        self.config = index.config
        self.bwtsize = index.bwtsize
        self.tile = tile
        rows = index.occ.shape[0]
        self.tables = {
            "entries": jax.device_put(
                np.concatenate([index.bitmaps.reshape(rows, -1), index.occ], axis=1)
            ),
            "dollar_pos": jax.device_put(index.dollar_pos),
            "dollar_base": jax.device_put(index.dollar_base),
            "dollar_block": jax.device_put(
                np.asarray(index.dollar_block, np.uint32)
            ),
        }
        if lut_m:
            from tpufm.engine.xla import build_prefix_lut

            self.tables["lut"] = jax.device_put(build_prefix_lut(
                self.tables, self.bwtsize, self.config.k, self.config.d, lut_m
            ))
        # The [2B, 1]-shaped carries + kernel output land in scoped vmem
        # inside the while body and blow the default 16M limit at 1M-read
        # waves (probe83: 20.97M needed at tile 2048); the documented
        # budget flag lifts it. Mosaic-only — interpret/CPU runs reject
        # unknown compiler options.
        opts = (
            {"xla_tpu_scoped_vmem_limit_kib": 65536}
            if not interpret
            else None
        )
        self._search = jax.jit(
            make_pallas_search_fn(
                self.config.k,
                self.config.d,
                tile=tile,
                interpret=interpret,
                lut_m=lut_m,
            ),
            compiler_options=opts,
        )

    #: reads per device wave (same rationale as XLAEngine.WAVE)
    WAVE = 1 << 20

    def search(self, queries, wave: int | None = None) -> np.ndarray:
        # Any batch size: the round kernel pads its flattened end-batch to a
        # tile multiple internally; batches beyond `wave` stream in
        # fixed-shape padded waves (one compiled shape, constant memory).
        from tpufm.utils.waves import stream_waves

        return stream_waves(
            np.asarray(queries, dtype=np.uint8),
            wave or self.WAVE,
            lambda q: self._search(
                self.tables, _U32(self.bwtsize), jnp.asarray(q)
            ),
            lambda h: np.asarray(jax.device_get(h)),
            depth=2,
        )

    def search_device(self, queries):
        return self._search(self.tables, _U32(self.bwtsize), queries)

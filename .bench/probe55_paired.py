"""Probe 55: paired-row gather — one gather slice serves BOTH interval ends.

Backward-search intervals narrow monotonically, and with a 12-mer LUT start
the interval width is typically << d from round 0, so hi_block - lo_block
is in {0, 1} for nearly every lane in every round. A lax.gather with
slice_sizes=(2, W) anchored at min(lo_block, E-1) fetches both rows in ONE
gather issue per READ (1M slices) instead of one per END (2M rows). If the
gather cost is per-ISSUE (the measured regime for narrow rows), this is up
to 2x the flagship.

A: raw dependent-chain rate, slice_sizes=(2,W) vs standard row gather.
B: rate at valley/genome sizes (is the win bigger on the HBM path?).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

_U32 = jnp.uint32
rng = np.random.default_rng(0)
B, ROUNDS = 1 << 20, 36


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:8]))


def timed(f, *a, it=3):
    out = f(*a)
    sync(out)
    ts = []
    for _ in range(it):
        t0 = time.perf_counter()
        out = f(*a)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def rec(**kw):
    print(json.dumps(kw), flush=True)
    with open("/root/repo/.bench/probe51_valley.jsonl", "a") as fh:
        fh.write(json.dumps(kw) + "\n")


def paired_gather(table, start):
    """table [E+1, W], start [B] -> [B, 2, W] via one slice-gather."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )
    return jax.lax.gather(
        table,
        start[:, None].astype(jnp.int32),
        dnums,
        slice_sizes=(2, table.shape[1]),
        mode=jax.lax.GatherScatterMode.CLIP,
    )


def chain_paired(E, W):
    table = jax.device_put(
        jnp.asarray(rng.integers(0, E - 1, size=(E + 1, W), dtype=np.uint32))
    )
    idx0 = jnp.asarray(rng.integers(0, E - 1, size=B, dtype=np.uint32))

    def fn(table, i0):
        def body(idx, _):
            rows = paired_gather(table, idx)  # [B, 2, W]
            nxt = (rows[:, 0, 0] ^ rows[:, 1, 1]) % _U32(E - 1)
            return nxt, None

        return jax.lax.scan(body, i0, None, length=ROUNDS)[0]

    dt = timed(jax.jit(fn), table, idx0)
    del table
    return B * ROUNDS / dt  # slices per second


def chain_standard(E, W):
    table = jax.device_put(
        jnp.asarray(rng.integers(0, E, size=(E + 1, W), dtype=np.uint32))
    )
    idx0 = jnp.asarray(rng.integers(0, E, size=(B, 2), dtype=np.uint32))

    def fn(table, i0):
        def body(idx, _):
            rows = table[idx]  # [B, 2, W]
            return rows[:, :, 0] % _U32(E), None

        return jax.lax.scan(body, i0, None, length=ROUNDS)[0]

    dt = timed(jax.jit(fn), table, idx0)
    del table
    return 2 * B * ROUNDS / dt  # rows per second


for E, W, tag in (
    (78_127, 88, "fast-vmem-d128"),
    (312_501, 88, "valley-d128"),
    (1_302_085, 100, "genome-d192"),
):
    sl = chain_paired(E, W)
    rows = chain_standard(E, W)
    rec(exp="I-paired", tag=tag, E=E, W=W,
        paired_slices_per_s=round(sl),
        standard_rows_per_s=round(rows),
        reads_per_s_if_paired=round(sl / ROUNDS),
        reads_per_s_if_standard=round(rows / (2 * ROUNDS)))

print("probe55 done", flush=True)

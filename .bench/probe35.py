"""probe35: raw per-row DMA gather rate in a Pallas kernel.

Measures rows/s of a many-outstanding-DMA gather (R async copies in
flight, indices staged HBM->SMEM in chunks) as a function of row width W
(uint32 words), outstanding slots R, and table rows E. Compares against
jnp.take on the same table/indices (the XLA gather the engine uses today).

Timing: host fetch per pass (block_until_ready unreliable on axon).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024


def make_dma_gather(E, W, R, N):
    def kern(idx_ref, ent_ref, out_ref, idx_smem, rows, sems, idx_sem):
        c = pl.program_id(0)
        cp = pltpu.make_async_copy(
            idx_ref.at[pl.ds(c * CHUNK, CHUNK)], idx_smem, idx_sem
        )
        cp.start()
        cp.wait()

        def body(j, _):
            slot = jax.lax.rem(j, R)

            @pl.when(j >= R)
            def _():
                prev = idx_smem[j - R]
                pltpu.make_async_copy(
                    ent_ref.at[prev], rows.at[slot], sems.at[slot]
                ).wait()

            idx = idx_smem[j]
            pltpu.make_async_copy(
                ent_ref.at[idx], rows.at[slot], sems.at[slot]
            ).start()
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0)

        def drain(j, _):
            slot = jax.lax.rem(j, R)
            idx = idx_smem[j]
            pltpu.make_async_copy(
                ent_ref.at[idx], rows.at[slot], sems.at[slot]
            ).wait()
            return 0

        jax.lax.fori_loop(CHUNK - R, CHUNK, drain, 0)
        out_ref[0, 0] = 1

    @jax.jit
    def run(idx, ent):
        return pl.pallas_call(
            kern,
            grid=(N // CHUNK,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            scratch_shapes=[
                pltpu.SMEM((CHUNK,), jnp.int32),
                pltpu.VMEM((R, W), jnp.uint32),
                pltpu.SemaphoreType.DMA((R,)),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(idx, ent)

    return run


def timeit(fn, *args, iters=3):
    out = fn(*args)
    np.asarray(jax.device_get(out.ravel()[:1]))  # warm + barrier
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(out.ravel()[:1]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    N = 1 << 20
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]}, N={N} rows per pass")
    for E in (208_000, 2_000_000):
        for W in (8, 32, 88, 128):
            ent = jnp.asarray(rng.integers(0, 2**32, (E, W), dtype=np.uint32))
            idx = jnp.asarray(rng.integers(0, E, N, dtype=np.int32))

            # XLA take baseline (same consumption: materialize [N, W] out)
            @jax.jit
            def xla_take(idx, ent):
                return jnp.take(ent, idx, axis=0)

            t_xla = timeit(xla_take, idx, ent)
            print(
                f"E={E:>9} W={W:>3} xla-take: {N/t_xla/1e6:8.1f} Mrows/s "
                f"({N*W*4/t_xla/1e9:6.1f} GB/s)"
            )

            for R in (8, 32, 128):
                run = make_dma_gather(E, W, R, N)
                t = timeit(run, idx, ent)
                print(
                    f"E={E:>9} W={W:>3} R={R:>3} dma:      {N/t/1e6:8.1f} Mrows/s "
                    f"({N*W*4/t/1e9:6.1f} GB/s)"
                )
            sys.stdout.flush()


if __name__ == "__main__":
    main()

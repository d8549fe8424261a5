import os, time, sys, functools
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.bench/jaxcache")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])

E, W = 156256, 128
TILE = 512
NSEM = 16

def kern(idx_ref, table_ref, out_ref, sems):
    base = pl.program_id(0) * TILE
    def body(j, _):
        row = idx_ref[base + j]
        dma = pltpu.make_async_copy(
            table_ref.at[pl.ds(row, 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[j % NSEM],
        )
        @pl.when(j >= NSEM)
        def _():
            pltpu.make_async_copy(
                table_ref.at[pl.ds(row, 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sems.at[j % NSEM],
            ).wait()
        dma.start()
        return 0
    jax.lax.fori_loop(0, TILE, body, 0)
    def drain(j, _):
        pltpu.make_async_copy(
            table_ref.at[pl.ds(0, 1), :],
            out_ref.at[pl.ds(0, 1), :],
            sems.at[j],
        ).wait()
        return 0
    jax.lax.fori_loop(0, NSEM, drain, 0)

def gather_dma(idx, table):
    n = idx.shape[0]
    grid = (n // TILE,)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec((TILE, W), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n, W), jnp.uint32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, table)

rng = np.random.default_rng(0)
table = jnp.asarray(rng.integers(0, 2**31, size=(E, W), dtype=np.int64).astype(np.uint32))
N = 2**17
idx = jnp.asarray(rng.integers(0, E, size=N).astype(np.int32))
f = jax.jit(gather_dma)
t0=time.perf_counter(); out = f(idx, table); jax.block_until_ready(out)
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
ok = np.array_equal(np.asarray(out), np.asarray(table)[np.asarray(idx)])
print("correct:", ok, flush=True)
t0=time.perf_counter()
for _ in range(10): out = f(idx, table)
jax.block_until_ready(out)
dt=(time.perf_counter()-t0)/10
print(f"DMA gather: {dt*1e3:.2f} ms  {N/dt/1e6:.1f} Mrows/s  {N*W*4/dt/1e9:.1f} GB/s", flush=True)

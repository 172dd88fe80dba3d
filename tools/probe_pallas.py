"""Capability probe for the fused roll-select warp kernel (round 2).

Checks, on the axon TPU:
  1. HBM->VMEM DMA with dynamic (SMEM-computed) offsets on a 3-D operand
  2. dynamic sublane slice of a VMEM buffer
  3. dynamic lane slice of a VMEM buffer
  4. pltpu.roll with static and dynamic shift
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def probe(name, fn):
    try:
        out = fn()
        print(f"OK   {name}: {out}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")


def dma_dynamic_offset():
    # tex [4, 64, 256]; copy tex[:, y0:y0+16, :] with runtime y0
    tex = jnp.arange(4 * 64 * 256, dtype=jnp.float32).reshape(4, 64, 256)

    def kernel(y0_ref, hbm_ref, out_ref, sem):
        y0 = y0_ref[0]
        dma = pltpu.make_async_copy(
            hbm_ref.at[:, pl.ds(y0, 16), :], out_ref, sem)
        dma.start()
        dma.wait()

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        ),
        out_shape=jax.ShapeDtypeStruct((4, 16, 256), jnp.float32),
    )(jnp.array([7], jnp.int32), tex)
    expect = tex[:, 7:23, :]
    return f"allclose={bool(jnp.allclose(out, expect))}"


def vmem_dyn_sublane():
    x = jnp.arange(64 * 256, dtype=jnp.float32).reshape(64, 256)

    def kernel(k_ref, x_ref, out_ref):
        k = k_ref[0]
        out_ref[:] = x_ref[pl.ds(k, 8), :]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
    )(jnp.array([5], jnp.int32), x)
    return f"allclose={bool(jnp.allclose(out, x[5:13]))}"


def vmem_dyn_lane():
    x = jnp.arange(16 * 1024, dtype=jnp.float32).reshape(16, 1024)

    def kernel(k_ref, x_ref, out_ref):
        k = k_ref[0]
        out_ref[:] = x_ref[:, pl.ds(k, 256)]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((16, 256), jnp.float32),
    )(jnp.array([37], jnp.int32), x)
    return f"allclose={bool(jnp.allclose(out, x[:, 37:37+256]))}"


def roll_static():
    x = jnp.arange(16 * 256, dtype=jnp.float32).reshape(16, 256)

    def kernel(x_ref, out_ref):
        out_ref[:] = pltpu.roll(x_ref[:], 3, 1)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 256), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    return f"allclose={bool(jnp.allclose(out, jnp.roll(x, 3, 1)))}"


def roll_dynamic():
    x = jnp.arange(16 * 256, dtype=jnp.float32).reshape(16, 256)

    def kernel(k_ref, x_ref, out_ref):
        out_ref[:] = pltpu.roll(x_ref[:], k_ref[0], 1)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((16, 256), jnp.float32),
    )(jnp.array([5], jnp.int32), x)
    return f"allclose={bool(jnp.allclose(out, jnp.roll(x, 5, 1)))}"


def rmw_dma():
    # read-modify-write into an HBM output via input_output_aliases
    x = jnp.ones((32, 256), jnp.float32)

    def kernel(x_ref, out_ref, scratch, sem_in, sem_out):
        dma = pltpu.make_async_copy(out_ref.at[pl.ds(8, 8), :], scratch, sem_in)
        dma.start(); dma.wait()
        scratch[:] = scratch[:] + 2.0
        dma2 = pltpu.make_async_copy(scratch, out_ref.at[pl.ds(8, 8), :], sem_out)
        dma2.start(); dma2.wait()

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((32, 256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 256), jnp.float32),
                        pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(())],
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)
    return f"sum={float(jnp.sum(out))} (expect {32*256 + 8*256*2.0})"


if __name__ == "__main__":
    probe("dma dynamic offset 3d", dma_dynamic_offset)
    probe("vmem dynamic sublane slice", vmem_dyn_sublane)
    probe("vmem dynamic lane slice", vmem_dyn_lane)
    probe("roll static", roll_static)
    probe("roll dynamic", roll_dynamic)
    probe("rmw dma via io alias", rmw_dma)

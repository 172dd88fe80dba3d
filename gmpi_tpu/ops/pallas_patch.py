"""Pallas patch gather — banded texture patches via double-buffered DMA.

The tile-banded warp needs one ``[B_x, B_y*C]`` patch per output tile.  In
XLA that is a vmapped ``dynamic_slice`` which lowers to gather — measured as
the warp's dominant cost (~90% of forward time at 96 planes x 1024²).  This
kernel streams the same patches with explicit HBM->VMEM DMA, two in flight:

grid = (N, T/K); each instance copies K patches straight into its output
block, starting patch k+1's DMA before waiting on patch k.

Offsets must be tile-aligned (x to 8 sublanes, y*C to 128 lanes — the caller
aligns starts down and sizes bands with the slack); ``pl.multiple_of`` hints
make the alignment provable to Mosaic.

STATUS: experimental.  On the tunneled v5e dev chip this measured *slower*
than the XLA gather (per-patch DMA latency dominates at ~150 KB patches; the
alignment slack also inflates traffic ~4x), so ``patch_backend="xla"``
remains the renderer default; revisit with batched multi-patch DMAs on
directly-attached hardware.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(offs_ref, tex_ref, out_ref, sems, *, k_tiles: int, band_x: int, band_yc: int):
    n = pl.program_id(0)

    def dma(k):
        x_lo = pl.multiple_of(offs_ref[0, k, 0], 8)
        y_lo4 = pl.multiple_of(offs_ref[0, k, 1], 128)
        return pltpu.make_async_copy(
            tex_ref.at[n, pl.ds(x_lo, band_x), pl.ds(y_lo4, band_yc)],
            out_ref.at[0, k],
            sems.at[k % 2],
        )

    dma(0).start()

    def body(k, _):
        @pl.when(k + 1 < k_tiles)
        def _():
            dma(k + 1).start()

        dma(k).wait()
        return 0

    jax.lax.fori_loop(0, k_tiles, body, 0)


def gather_patches(
    texf: jnp.ndarray,  # [N, Wp, Hp*C] fused x-major texture (zero-padded)
    offs: jnp.ndarray,  # [N, T, 2] int32: (x_lo, y_lo*C), tile-aligned
    band_x: int,
    band_yc: int,
    k_tiles: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """-> patches [N, T, band_x, band_yc] (same values as the vmapped
    ``dynamic_slice`` formulation)."""
    n, wp, hpc = texf.shape
    t = offs.shape[1]
    assert t % k_tiles == 0, (t, k_tiles)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n, t // k_tiles),
        in_specs=[
            pl.BlockSpec((1, k_tiles, 2), lambda ni, ti: (ni, ti, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, k_tiles, band_x, band_yc), lambda ni, ti: (ni, ti, 0, 0)
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(_kernel, k_tiles=k_tiles, band_x=band_x, band_yc=band_yc)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, t, band_x, band_yc), texf.dtype),
        interpret=interpret,
    )(offs, texf)

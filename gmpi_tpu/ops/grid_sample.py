"""Bilinear grid sampling with PyTorch ``F.grid_sample`` semantics, in pure jnp.

This is the renderer's hot op.  The reference calls
``torch.nn.functional.grid_sample(..., mode="bilinear", padding_mode="zeros")``
(``gmpi/core/mpi.py:136-142``).

TPU formulation: ONE ``lax.gather`` fetching the 2x2xC window per output
pixel from a zero-padded channels-last texture, then a weighted combine — one
window gather profiles ~5x faster on TPU than four independent per-tap
gathers in NCHW layout (fewer index streams, contiguous minor dims).
Zero padding of one texel on each side reproduces ``padding_mode="zeros"``
exactly: out-of-bounds taps read the zero ring, and clamping the window start
into the padded extent keeps every in-bounds tap aligned.  The VJP w.r.t. the
texture is the transpose scatter-add, derived by JAX autodiff.

The Pallas MXU warp kernel (``gmpi_tpu/ops/pallas_warp.py``) supersedes this
on TPU for the fused homography+sample path; this op remains the portable
reference and the arbitrary-grid entry point.

Coordinate conventions (must match torch exactly for the allclose bar):

* ``align_corners=True``:  ``pix = (g + 1) / 2 * (size - 1)`` — grid ±1 maps
  to boundary-pixel *centers*.
* ``align_corners=False``: ``pix = ((g + 1) * size - 1) / 2`` — grid ±1 maps
  outside the boundary pixels by half a pixel.
* ``padding_mode="zeros"``: taps outside ``[0, size-1]`` contribute zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _unnormalize(g: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (g + 1.0) * 0.5 * (size - 1)
    return ((g + 1.0) * size - 1.0) * 0.5


def grid_sample_bilinear(
    tex: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
) -> jnp.ndarray:
    """Sample ``tex [N, C, H, W]`` at ``grid [N, Ho, Wo, 2]`` (last dim = (u, v)
    i.e. (x, y) in [-1, 1]).  Returns ``[N, C, Ho, Wo]``, dtype of ``tex``.
    """
    n, c, h, w = tex.shape
    _, ho, wo, _ = grid.shape
    compute_dtype = tex.dtype

    fx = _unnormalize(grid[..., 0].astype(compute_dtype), w, align_corners)  # [N, Ho, Wo]
    fy = _unnormalize(grid[..., 1].astype(compute_dtype), h, align_corners)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = (fx - x0).reshape(n, -1, 1)
    wy = (fy - y0).reshape(n, -1, 1)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # zero ring of 1 texel: taps with x0 in [-1, size-1] resolve inside the
    # padded texture with correct alignment; anything farther out is fully
    # outside the texture and must contribute exactly zero (mask below)
    texl = jnp.pad(tex.transpose(0, 2, 3, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    in_range = (
        (x0i >= -1) & (x0i <= w - 1) & (y0i >= -1) & (y0i <= h - 1)
    ).reshape(n, -1, 1)
    starts = jnp.stack(
        [(y0i + 1).reshape(n, -1), (x0i + 1).reshape(n, -1)], axis=-1
    )  # [N, P, 2] window starts in padded coords
    starts = jnp.clip(starts, 0, jnp.asarray([h, w], jnp.int32))

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def one(tl, st):
        return lax.gather(tl, st, dnums, slice_sizes=(2, 2, c),
                          mode=lax.GatherScatterMode.CLIP)

    win = jax.vmap(one)(texl, starts)  # [N, P, 2, 2, C]
    top = win[:, :, 0, 0] * (1 - wx) + win[:, :, 0, 1] * wx
    bot = win[:, :, 1, 0] * (1 - wx) + win[:, :, 1, 1] * wx
    out = (top * (1 - wy) + bot * wy) * in_range  # [N, P, C]
    return out.reshape(n, ho, wo, c).transpose(0, 3, 1, 2)


def grid_sample_bilinear_stopgrad_grid(
    tex: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = True
) -> jnp.ndarray:
    """grid_sample with the grid treated as a constant (no gradient to the
    grid) — the reference computes the UV grid under ``torch.no_grad()``
    (``gmpi/core/mpi.py:65``), so pose gradients are intentionally cut."""
    return grid_sample_bilinear(tex, lax.stop_gradient(grid), align_corners)

"""Bilinear grid sampling with PyTorch ``F.grid_sample`` semantics, in pure jnp.

This is the renderer's hot op.  The reference calls
``torch.nn.functional.grid_sample(..., mode="bilinear", padding_mode="zeros")``
(``gmpi/core/mpi.py:136-142``); on TPU the equivalent is a 4-tap gather with
zero-masked out-of-bounds taps.  The VJP w.r.t. the texture is the transpose
scatter-add, which JAX autodiff derives from this formulation automatically —
matching ``grid_sampler_backward`` semantics.

Coordinate conventions (must match torch exactly for the allclose bar):

* ``align_corners=True``:  ``pix = (g + 1) / 2 * (size - 1)`` — grid ±1 maps
  to boundary-pixel *centers*.
* ``align_corners=False``: ``pix = ((g + 1) * size - 1) / 2`` — grid ±1 maps
  outside the boundary pixels by half a pixel.
* ``padding_mode="zeros"``: taps outside ``[0, size-1]`` contribute zero.
"""

from __future__ import annotations

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
    wx1 = fx - x0
    wy1 = fy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def tap(xi, yi, wgt):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        flat_idx = (yc * w + xc).reshape(n, 1, ho * wo)
        flat_idx = jnp.broadcast_to(flat_idx, (n, c, ho * wo))
        vals = jnp.take_along_axis(tex.reshape(n, c, h * w), flat_idx, axis=2)
        vals = vals.reshape(n, c, ho, wo)
        wm = jnp.where(inb, wgt, jnp.zeros_like(wgt))[:, None, :, :]
        return vals * wm

    out = (
        tap(x0i, y0i, wx0 * wy0)
        + tap(x1i, y0i, wx1 * wy0)
        + tap(x0i, y1i, wx0 * wy1)
        + tap(x1i, y1i, wx1 * wy1)
    )
    return out


def grid_sample_bilinear_stopgrad_grid(
    tex: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = True
) -> jnp.ndarray:
    """grid_sample with the grid treated as a constant (no gradient to the
    grid) — the reference computes the UV grid under ``torch.no_grad()``
    (``gmpi/core/mpi.py:65``), so pose gradients are intentionally cut."""
    return grid_sample_bilinear(tex, lax.stop_gradient(grid), align_corners)

"""Tile-banded MXU warp — TPU-native bilinear grid sampling without gathers.

Per-pixel gathers hit the TPU's scalar gather path (~1e9 small slices/s —
measured 50-100x off roofline on v5e for the renderer's access pattern).
This formulation exploits the smoothness of homography warps: within an
output tile of (8 x 128) pixels, source coordinates span a bounded texture
band.  Per tile:

1. slice one contiguous texture patch ``[B_y, B_x, C]`` (one big
   ``dynamic_slice`` instead of 1024 tiny window gathers);
2. build bilinear *hat* weights against the patch grid:
   ``hat_x[p, j] = relu(1 - |tx_p - (x_lo + j)|)`` (two nonzeros per row, and
   exactly zero for out-of-patch taps — reproducing ``padding_mode="zeros"``
   when the texture is zero-padded);
3. interpolate as dense algebra: an MXU matmul
   ``M[p, (y, c)] = hat_x[p, :] @ patch[(y, c), :]^T`` followed by the tiny
   contraction ``out[p, c] = sum_y hat_y[p, y] * M[p, y, c]``.

``sum_y hat_y (sum_x hat_x T)`` is exactly separable bilinear interpolation,
so results match ``grid_sample_bilinear`` to fp32 reassociation (~1e-6).

Band sizes are static (compile-time) and must cover the per-tile coordinate
span; ``required_bands`` measures the true spans for a given grid so callers
can validate a configuration once per (camera distribution, resolution).
Out-of-band tiles (pathological poses) lose taps — ``check=True`` adds a
debug assertion.

The VJP falls out of autodiff: the transpose of the patch ``dynamic_slice``
is a contiguous scatter-add, and the matmuls transpose to matmuls — the
backward pass runs on the MXU too.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from gmpi_tpu.ops.grid_sample import _unnormalize


def _tile_coords(tex_shape, grid, align_corners, tile_r, tile_c):
    n, c, h, w = tex_shape
    _, ho, wo, _ = grid.shape
    assert ho % tile_r == 0 and wo % tile_c == 0, (ho, wo, tile_r, tile_c)
    fx = _unnormalize(grid[..., 0], w, align_corners)  # [N, Ho, Wo]
    fy = _unnormalize(grid[..., 1], h, align_corners)
    nty, ntx = ho // tile_r, wo // tile_c
    # [N, nty, ntx, tile_r, tile_c]
    fx_t = fx.reshape(n, nty, tile_r, ntx, tile_c).transpose(0, 1, 3, 2, 4)
    fy_t = fy.reshape(n, nty, tile_r, ntx, tile_c).transpose(0, 1, 3, 2, 4)
    return fx_t, fy_t, nty, ntx


def required_bands(
    tex_shape: Tuple[int, int, int, int],
    grid: jnp.ndarray,
    align_corners: bool = True,
    tile: Tuple[int, int] = (8, 128),
) -> Tuple[int, int]:
    """Smallest (B_y, B_x) covering every tile of this grid (host helper)."""
    fx_t, fy_t, _, _ = _tile_coords(tex_shape, grid, align_corners, *tile)
    spans = []
    for f in (fy_t, fx_t):
        f0 = jnp.floor(f)
        # band origin is floor_min - 1 and the highest tap is floor_max + 1,
        # so the band must span floor_max - floor_min + 3 positions
        span = jnp.max(jnp.max(f0, axis=(3, 4)) - jnp.min(f0, axis=(3, 4))) + 3
        spans.append(int(span))
    return spans[0], spans[1]


def bands_cover(
    tex_shape: Tuple[int, int, int, int],
    grid: jnp.ndarray,
    band_y: int,
    band_x: int,
    align_corners: bool = True,
    tile: Tuple[int, int] = (8, 128),
) -> jnp.ndarray:
    """Jittable out-of-band check: True iff every tile's source span fits the
    static bands (the runtime analogue of the reference's per-render
    geometric asserts, ``gmpi/core/mpi.py:103-128,381-395``).  Runs as a few
    fused reductions — cheap enough for every production render."""
    fx_t, fy_t, _, _ = _tile_coords(tex_shape, grid, align_corners, *tile)
    ok = jnp.bool_(True)
    for f, band in ((fy_t, band_y), (fx_t, band_x)):
        f0 = jnp.floor(f)
        span = jnp.max(jnp.max(f0, axis=(3, 4)) - jnp.min(f0, axis=(3, 4))) + 3
        ok = ok & (span <= band)
    return ok


def _warp_row_tiles(texf, fx_row, fy_row, band_y, band_x, pad_y, pad_x, h, w, c, tile_r, tile_c,
                    patch_backend="xla", interpret=False, compute_dtype=None):
    """Warp one row of tiles: fx/fy [N, ntx, tile_r, tile_c] -> [N, ntx, P, C].

    ``texf`` is the x-major fused texture [N, Wp, Hp*C] — patches slice out
    directly as matmul-ready ``[B_x, B_y*C]`` operands (no per-tile
    transposes, which otherwise dominate the warp on TPU)."""
    n, ntx = fx_row.shape[0], fx_row.shape[1]
    p_tile = tile_r * tile_c
    y_lo = jnp.floor(jnp.min(fy_row, axis=(2, 3))).astype(jnp.int32) - 1  # [N, ntx]
    x_lo = jnp.floor(jnp.min(fx_row, axis=(2, 3))).astype(jnp.int32) - 1
    y_lo_c = jnp.clip(y_lo + pad_y, 0, h + 2 * pad_y - band_y)
    x_lo_c = jnp.clip(x_lo + pad_x, 0, w + 2 * pad_x - band_x)

    if patch_backend == "pallas":
        # tile-aligned starts for DMA (bands must carry the slack: y to
        # 128/c lanes, x to 8 sublanes)
        y_align = max(1, 128 // c)
        y_lo_c = (y_lo_c // y_align) * y_align
        x_lo_c = (x_lo_c // 8) * 8
        from gmpi_tpu.ops.pallas_patch import gather_patches

        offs = jnp.stack([x_lo_c, y_lo_c * c], axis=-1).astype(jnp.int32)  # [N, ntx, 2]
        t = offs.shape[1]
        k = 8
        while t % k:
            k -= 1
        pm = gather_patches(texf, offs, band_x, band_y * c, k_tiles=k, interpret=interpret)
    else:
        def slice_patch(tf, yl, xl):
            return lax.dynamic_slice(tf, (xl, yl * c), (band_x, band_y * c))

        pm = jax.vmap(jax.vmap(slice_patch, in_axes=(None, 0, 0)))(texf, y_lo_c, x_lo_c)
    # [N, ntx, B_x, B_y*C]

    ty_rel = fy_row.reshape(n, ntx, p_tile, 1) - (y_lo_c - pad_y).astype(fy_row.dtype)[..., None, None]
    tx_rel = fx_row.reshape(n, ntx, p_tile, 1) - (x_lo_c - pad_x).astype(fx_row.dtype)[..., None, None]
    iy = lax.broadcasted_iota(fy_row.dtype, (1, 1, 1, band_y), 3)
    ix = lax.broadcasted_iota(fx_row.dtype, (1, 1, 1, band_x), 3)
    hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(ty_rel - iy))  # [N, ntx, P, B_y]
    hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(tx_rel - ix))  # [N, ntx, P, B_x]

    if compute_dtype is not None:
        # fast mode: bf16 operands, fp32 MXU accumulation (~4e-3 rel error)
        hat_x = hat_x.astype(compute_dtype)
        hat_y = hat_y.astype(compute_dtype)
        pm = pm.astype(compute_dtype)
    # precision must be explicit: TPU DEFAULT truncates fp32 MXU operands to
    # bf16 (~5e-3 rel error at production scale — the round-2 "oracle" bug;
    # CPU tests never see it).  fp32 parity needs HIGHEST; the bf16 fast mode
    # opts in via compute_dtype + DEFAULT.
    mxu_prec = (lax.Precision.DEFAULT if compute_dtype is not None
                else lax.Precision.HIGHEST)
    mixed = jnp.einsum("...px,...xm->...pm", hat_x, pm,
                       precision=mxu_prec,
                       preferred_element_type=jnp.float32)  # [N, ntx, P, B_y*C]
    mixed = mixed.reshape(n, ntx, p_tile, band_y, c)
    return jnp.einsum("...py,...pyc->...pc", hat_y.astype(mixed.dtype), mixed,
                      precision=mxu_prec,
                      preferred_element_type=jnp.float32)  # [N, ntx, P, C]


def grid_sample_tiled(
    tex: jnp.ndarray,  # [N, C, H, W]
    grid: jnp.ndarray,  # [N, Ho, Wo, 2]
    band_y: int = 32,
    band_x: int = 160,
    tile: Tuple[int, int] = (8, 128),
    align_corners: bool = True,
    row_scan: bool = False,
    rows_per_step: int = 1,
    patch_backend: str = "xla",
    interpret: bool = False,
    compute_dtype=None,
    check: bool = False,
) -> jnp.ndarray:
    """Bilinear sample with zeros padding; returns [N, C, Ho, Wo].

    ``check=True`` adds the out-of-band runtime assertion promised by the
    band contract: if any tile's source span exceeds (band_y, band_x) —
    a pathological pose outside the planned distribution — the output is
    NaN-poisoned so the violation surfaces in any downstream loss/allclose
    instead of silently dropping taps.

    ``patch_backend="pallas"`` streams texture patches through the Pallas DMA
    gather (``ops/pallas_patch.py``) instead of XLA's gather lowering of
    vmapped ``dynamic_slice`` — the latter is the measured forward bottleneck
    at scale.  Bands must then include the DMA alignment slack: band_y must
    be a multiple of 128/C covering span + (128/C - 1); band_x a multiple of
    8 covering span + 7.

    ``band_y``/``band_x`` must cover each tile's source span (see
    :func:`required_bands`); generous defaults suit the GMPI camera ranges at
    tex_size == img_size.  ``row_scan=True`` processes tile rows through a
    ``lax.scan`` — same results, O(ntx) live memory instead of O(nty*ntx)
    (required at 1024²+ where the hat matrices would otherwise reach tens of
    GB).
    """
    n, c, h, w = tex.shape
    _, ho, wo, _ = grid.shape
    tile_r, tile_c = tile
    fx_t, fy_t, nty, ntx = _tile_coords(tex.shape, grid, align_corners, tile_r, tile_c)
    p_tile = tile_r * tile_c

    # generous zero pad: every clamped band start reads real texels or zeros.
    # x-major fused layout [N, Wp, Hp*C]: patch slices arrive matmul-ready.
    pad_y, pad_x = band_y, band_x
    texl = jnp.pad(
        tex.transpose(0, 3, 2, 1),
        ((0, 0), (pad_x, pad_x), (pad_y, pad_y), (0, 0)),
    ).reshape(n, w + 2 * pad_x, (h + 2 * pad_y) * c)  # [N, Wp, Hp*C]

    if patch_backend == "pallas":
        y_align = max(1, 128 // c)
        assert band_y % y_align == 0 and band_x % 8 == 0, (band_y, band_x)
    if compute_dtype is not None:
        texl = texl.astype(compute_dtype)  # halves patch HBM traffic too
    args = (band_y, band_x, pad_y, pad_x, h, w, c, tile_r, tile_c, patch_backend, interpret,
            compute_dtype)
    if row_scan:
        g = max(1, min(rows_per_step, nty))
        while nty % g:
            g -= 1
        fx_s = fx_t.swapaxes(0, 1).reshape(nty // g, g, n, ntx, tile_r, tile_c)
        fy_s = fy_t.swapaxes(0, 1).reshape(nty // g, g, n, ntx, tile_r, tile_c)
        # fold the row group into the tile axis: one step warps g*ntx tiles
        fx_s = fx_s.transpose(0, 2, 1, 3, 4, 5).reshape(nty // g, n, g * ntx, tile_r, tile_c)
        fy_s = fy_s.transpose(0, 2, 1, 3, 4, 5).reshape(nty // g, n, g * ntx, tile_r, tile_c)

        def body(_, xs):
            fx_row, fy_row = xs
            return None, _warp_row_tiles(texl, fx_row, fy_row, *args)

        _, out = lax.scan(body, None, (fx_s, fy_s))  # [nty/g, N, g*ntx, P, C]
        out = out.reshape(nty // g, n, g, ntx, p_tile, c).transpose(1, 0, 2, 3, 4, 5)
        out = out.reshape(n, nty, ntx, p_tile, c)
    else:
        out = jax.vmap(
            lambda fx_row, fy_row: _warp_row_tiles(texl, fx_row, fy_row, *args),
            in_axes=(1, 1), out_axes=1,
        )(fx_t, fy_t)  # [N, nty, ntx, P, C]

    out = out.reshape(n, nty, ntx, tile_r, tile_c, c)
    out = out.transpose(0, 5, 1, 3, 2, 4).reshape(n, c, ho, wo)
    if check:
        ok = bands_cover(tex.shape, grid, band_y, band_x, align_corners, tile)
        out = jnp.where(ok, out, jnp.nan)
    return out


def make_tiled_warp_with_adjoint(
    band_y: int,
    band_x: int,
    adjoint_bands: Tuple[int, int],
    tile: Tuple[int, int] = (8, 128),
    align_corners: bool = True,
    row_scan: bool = False,
    rows_per_step: int = 1,
    adjoint_tile: Tuple[int, int] = (32, 512),
    adjoint_rows_per_step: int = 1,
    patch_backend: str = "xla",
):
    """Tiled warp with the exact scatter-free adjoint as its VJP.

    Returns ``f(tex, grid) -> samples`` whose backward computes ``d_tex`` via
    ``gmpi_tpu.ops.tiled_warp_adjoint`` (tiled splat on the MXU) instead of
    XLA scatter-add, and stores only ``grid`` as residual (hats are
    recomputed) — removing both the scatter and the need for rematerializing
    the forward under ``lax.scan``.  The grid is treated as a constant
    (reference semantics: UV grids carry no gradient, ``gmpi/core/mpi.py:65``).
    """
    from gmpi_tpu.ops.tiled_warp_adjoint import grid_sample_tiled_adjoint

    pbr, pbc = adjoint_bands

    @jax.custom_vjp
    def f(tex, grid):
        return grid_sample_tiled(
            tex, grid, band_y, band_x, tile, align_corners, row_scan, rows_per_step,
            patch_backend=patch_backend,
        )

    def fwd(tex, grid):
        return f(tex, grid), (grid, tex.shape)

    def bwd(res, cot):
        grid, tex_shape = res
        th, tw = tex_shape[2], tex_shape[3]
        atile = (
            adjoint_tile[0] if th % adjoint_tile[0] == 0 else (8 if th % 8 == 0 else 1),
            adjoint_tile[1] if tw % adjoint_tile[1] == 0 else
            (256 if tw % 256 == 0 else 128 if tw % 128 == 0 else tw),
        )
        d_tex = grid_sample_tiled_adjoint(
            cot, grid, tex_shape, pbr, pbc, tile=atile,
            align_corners=align_corners, row_scan=row_scan,
            rows_per_step=adjoint_rows_per_step,
        )
        return d_tex, None

    f.defvjp(fwd, bwd)
    return f

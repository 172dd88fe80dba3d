"""Exact scatter-free adjoint of the tile-banded warp ("tiled splat").

The VJP of bilinear sampling w.r.t. the texture is a splat:
``d_tex[ty, tx] = sum_p hat(fx_p - tx) hat(fy_p - ty) cot_p``.  XLA autodiff
expresses this as a scatter-add of per-tile patches — the dominant cost of
the renderer backward on TPU.  This module computes the same sum as dense
algebra instead, with the roles of texture and image swapped relative to the
forward pass:

for each (8 x 128) *texture* tile, the contributing output pixels lie in a
bounded output-space band (the warp is projective and, for GMPI's camera
range, monotone along both image axes).  Per texture tile:

1. slice the output-pixel band of ``cot`` / ``fx`` / ``fy``;
2. build hat matrices against the tile's texel grid:
   ``M_y[p, ty] = hat(fy_p - ty)`` (8 columns), ``M_x[p, tx]`` (128 columns);
3. accumulate via one MXU matmul:
   ``d_tile[(ty, c), tx] = (M_y ⊗ cot)[p, (ty, c)]^T @ M_x[p, tx]``.

Out-of-image padding of the band carries ``fx = -inf`` sentinels so padded
pixels contribute exactly zero.  The band *starts* come from searchsorted
over per-row/per-column coordinate extrema (monotone for non-flipping
homographies — validated by :func:`check_monotone`); band *sizes* are static,
estimated per camera distribution like the forward bands.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from gmpi_tpu.ops.grid_sample import _unnormalize

_SENTINEL = -1e6


def _coords(tex_shape, grid, align_corners):
    n, c, th, tw = tex_shape
    fx = _unnormalize(grid[..., 0], tw, align_corners)  # [N, Ho, Wo]
    fy = _unnormalize(grid[..., 1], th, align_corners)
    return fx, fy


def check_monotone(tex_shape, grid, align_corners: bool = True) -> bool:
    """The band search assumes fy extrema are non-decreasing along image rows
    and fx extrema along image columns (no flips/rotations > 90°)."""
    fx, fy = _coords(tex_shape, grid, align_corners)
    fy_max = jnp.max(fy, axis=2)  # [N, Ho]
    fx_max = jnp.max(fx, axis=1)  # [N, Wo]
    ok_y = bool(jnp.all(jnp.diff(fy_max, axis=1) >= -1e-3))
    ok_x = bool(jnp.all(jnp.diff(fx_max, axis=1) >= -1e-3))
    return ok_y and ok_x


def required_output_bands(
    tex_shape, grid, align_corners: bool = True, tile: Tuple[int, int] = (8, 128)
) -> Tuple[int, int]:
    """Smallest (rows, cols) output band covering every texture tile's
    contributing pixels, given this grid (host helper, mirrors
    ``required_bands``)."""
    import numpy as np

    n, c, th, tw = tex_shape
    fx, fy = _coords(tex_shape, grid, align_corners)
    fx = np.asarray(fx)
    fy = np.asarray(fy)
    tr, tc = tile
    max_rows = max_cols = 1
    fy_max = fy.max(axis=2)
    fy_min = fy.min(axis=2)
    fx_max = fx.max(axis=1)
    fx_min = fx.min(axis=1)
    for ni in range(n):
        for t0 in range(0, th, tr):
            rows = np.where((fy_max[ni] >= t0 - 1) & (fy_min[ni] <= t0 + tr + 1))[0]
            if rows.size:
                max_rows = max(max_rows, rows[-1] - rows[0] + 1)
        for t0 in range(0, tw, tc):
            cols = np.where((fx_max[ni] >= t0 - 1) & (fx_min[ni] <= t0 + tc + 1))[0]
            if cols.size:
                max_cols = max(max_cols, cols[-1] - cols[0] + 1)
    return int(max_rows) + 2, int(max_cols) + 2


def grid_sample_tiled_adjoint(
    cot: jnp.ndarray,  # [N, C, Ho, Wo] — cotangent of the warped output
    grid: jnp.ndarray,  # [N, Ho, Wo, 2] — the forward sampling grid
    tex_shape: Tuple[int, int, int, int],
    band_rows: int,
    band_cols: int,
    tile: Tuple[int, int] = (8, 128),
    align_corners: bool = True,
    row_scan: bool = False,
    rows_per_step: int = 1,
) -> jnp.ndarray:
    """d_tex [N, C, Th, Tw] = adjoint-warp of ``cot`` — no scatter ops.

    ``row_scan``/``rows_per_step`` mirror the forward: texture tile-rows are
    processed through a ``lax.scan`` in groups to balance live memory against
    per-step overhead."""
    n, c, th, tw = tex_shape
    _, _, ho, wo = cot.shape
    tr, tc = tile
    assert th % tr == 0 and tw % tc == 0, (th, tw, tile)
    n_ty, n_tx = th // tr, tw // tc

    fx, fy = _coords(tex_shape, grid, align_corners)

    # pad output space; sentinel coords make padded pixels contribute zero
    pr, pc = band_rows, band_cols
    cot_pad = jnp.pad(cot, ((0, 0), (0, 0), (pr, pr), (pc, pc)))
    fx_pad = jnp.pad(fx, ((0, 0), (pr, pr), (pc, pc)), constant_values=_SENTINEL)
    fy_pad = jnp.pad(fy, ((0, 0), (pr, pr), (pc, pc)), constant_values=_SENTINEL)

    # band starts from monotone extrema (padded coords)
    fy_row_max = jnp.max(fy, axis=2)  # [N, Ho]
    fx_col_max = jnp.max(fx, axis=1)  # [N, Wo]
    ty0 = jnp.arange(n_ty, dtype=jnp.float32) * tr  # texel row of each tile row
    tx0 = jnp.arange(n_tx, dtype=jnp.float32) * tc

    def starts(ext, t0s, pad, padded_len, band):
        # first unpadded index whose max coord reaches (t0 - 1), shifted into
        # padded coords; clamped so the band slice fits
        idx = jax.vmap(lambda e: jnp.searchsorted(e, t0s - 1.0))(ext)  # [N, n_t]
        return jnp.clip(idx + pad, 0, padded_len - band)

    py_lo = starts(fy_row_max, ty0, pr, ho + 2 * pr, band_rows)  # [N, n_ty]
    px_lo = starts(fx_col_max, tx0, pc, wo + 2 * pc, band_cols)  # [N, n_tx]

    def tile_fn(cot_p, fx_p, fy_p, py, px, trow, tcol0):
        cot_b = lax.dynamic_slice(cot_p, (0, py, px), (c, band_rows, band_cols))
        fx_b = lax.dynamic_slice(fx_p, (py, px), (band_rows, band_cols))
        fy_b = lax.dynamic_slice(fy_p, (py, px), (band_rows, band_cols))
        p = band_rows * band_cols
        fx_f = fx_b.reshape(p, 1)
        fy_f = fy_b.reshape(p, 1)
        tys = trow + lax.broadcasted_iota(jnp.float32, (1, tr), 1)
        txs = tcol0 + lax.broadcasted_iota(jnp.float32, (1, tc), 1)
        m_y = jnp.maximum(0.0, 1.0 - jnp.abs(fy_f - tys))  # [P, tr]
        m_x = jnp.maximum(0.0, 1.0 - jnp.abs(fx_f - txs))  # [P, tc]
        cot_f = cot_b.reshape(c, p)
        wmat = (m_y[:, :, None] * cot_f.T[:, None, :]).reshape(p, tr * c)  # [P, tr*C]
        # HIGHEST: TPU DEFAULT truncates fp32 MXU operands to bf16 (adjoint
        # must match the forward warp's exact-fp32 contraction)
        d = jnp.einsum("pm,px->mx", wmat, m_x,
                       precision=lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)  # [tr*C, tc]
        return d.reshape(tr, c, tc).transpose(1, 0, 2)  # [C, tr, tc]

    # vmap over column tiles, then row tiles (optionally scanned), then batch
    def row_of_tiles(cot_p, fx_p, fy_p, py, px_all, trow):
        return jax.vmap(
            lambda px, tcol0: tile_fn(cot_p, fx_p, fy_p, py, px, trow, tcol0)
        )(px_all, tx0)  # [n_tx, C, tr, tc]

    def one_sample(cot_p, fx_p, fy_p, py_all, px_all):
        if row_scan:
            g = max(1, min(rows_per_step, n_ty))
            while n_ty % g:
                g -= 1
            py_g = py_all.reshape(n_ty // g, g)
            ty_g = ty0.reshape(n_ty // g, g)

            def body(_, inp):
                pys, trows = inp
                return None, jax.vmap(
                    lambda py, trow: row_of_tiles(cot_p, fx_p, fy_p, py, px_all, trow)
                )(pys, trows)  # [g, n_tx, C, tr, tc]

            _, rows = lax.scan(body, None, (py_g, ty_g))
            rows = rows.reshape(n_ty, n_tx, c, tr, tc)
        else:
            rows = jax.vmap(
                lambda py, trow: row_of_tiles(cot_p, fx_p, fy_p, py, px_all, trow)
            )(py_all, ty0)  # [n_ty, n_tx, C, tr, tc]
        return rows

    rows = jax.vmap(one_sample)(cot_pad, fx_pad, fy_pad, py_lo, px_lo)
    # [N, n_ty, n_tx, C, tr, tc] -> [N, C, Th, Tw]
    out = rows.transpose(0, 3, 1, 4, 2, 5).reshape(n, c, th, tw)
    return out

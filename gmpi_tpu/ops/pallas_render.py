"""Fused Pallas MPI render kernel — warp + over-composite in one pass.

The XLA path (``ops/tiled_warp.py`` + ``core/renderer.composite``) materializes
the warped plane stack ``[V*L, 4, H, W]`` in HBM between the warp and the
composite (1.5 GB at 96 planes x 1024²).  This kernel fuses them: for each
output tile, it marches the planes front-to-back, DMAs each plane's texture
band into VMEM (double-buffered), interpolates with the tile-banded hat-matmul
formulation (exact bilinear, MXU), and over-composites in registers — the
plane stack never round-trips through HBM.

Geometry is computed in-kernel from 15 per-view scalars (unnormalized ray
basis r(j, i) = A j + B i + C, eye, optical axis) + 3 per-plane scalars
(depth, extent): ray normalization cancels in both the warp ratio and the
expected-depth term, so everything is rational in (j, i); texture-band starts
come from tile-corner evaluations (projective maps take extrema at corners).
Reference semantics: ``gmpi/core/mpi.py:26-153`` (homography + bilinear,
zeros padding, align_corners=True) and ``:421-434`` (cumprod compositing,
eps 1e-10).

Forward-only for now — backward runs through the XLA tiled path.  TPU Pallas
grids execute sequentially per core, so there are no inter-tile races.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

COMPOSITE_EPS = 1e-10

# default output tile (overridable per call; TILE_C shrinks for small images)
TILE_R = 8
TILE_C = 128


def _ray_basis(focal: float, img_h: int, img_w: int, c2w: jnp.ndarray):
    """Per-view unnormalized ray basis: r(j, i) = A j + B i + C (world frame);
    matches ``camera.pixel_ray_dirs_cam`` + rotation minus the (cancelling)
    normalization: r_cam = [(j+.5-W/2)/f, (i+.5-H/2)/f, 1]."""
    rot = c2w[..., :3, :3]
    a = rot[..., :, 0] / focal
    b = rot[..., :, 1] / focal
    c = (
        rot[..., :, 2]
        + rot[..., :, 0] * ((0.5 - img_w / 2.0) / focal)
        + rot[..., :, 1] * ((0.5 - img_h / 2.0) / focal)
    )
    return a, b, c


def _kernel(
    view_ref,  # scalar prefetch [V, 15] fp32 (SMEM)
    plane_ref,  # scalar prefetch [L, 3] fp32 (SMEM)
    tex_ref,  # [V, L, Hp, Wp, 4] fp32 (ANY — manual DMA)
    color_ref,  # out tile [1, TILE_R, TILE_C, 3]
    depth_ref,  # out tile [1, TILE_R, TILE_C, 1]
    patch_buf,  # VMEM scratch [2, By, Bx, 4]
    sems,  # DMA semaphores (2,)
    *,
    n_planes: int,
    band_y: int,
    band_x: int,
    tex_h: int,
    tex_w: int,
    tile_r: int,
    tile_c: int,
):
    TILE_R, TILE_C = tile_r, tile_c
    v = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    A0, A1, A2 = view_ref[v, 0], view_ref[v, 1], view_ref[v, 2]
    B0, B1, B2 = view_ref[v, 3], view_ref[v, 4], view_ref[v, 5]
    C0, C1, C2 = view_ref[v, 6], view_ref[v, 7], view_ref[v, 8]
    ex, ey, ez = view_ref[v, 9], view_ref[v, 10], view_ref[v, 11]
    zx, zy, zz = view_ref[v, 12], view_ref[v, 13], view_ref[v, 14]

    i0 = (ti * TILE_R).astype(jnp.float32)
    j0 = (tj * TILE_C).astype(jnp.float32)

    # --- per-tile ray field (plane-independent) ---------------------------
    ii = lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 0).astype(jnp.float32) + i0
    jj = lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_C), 1).astype(jnp.float32) + j0
    rx = A0 * jj + B0 * ii + C0
    ry = A1 * jj + B1 * ii + C1
    rz = A2 * jj + B2 * ii + C2
    inv_rz = 1.0 / rz
    rdotz = rx * zx + ry * zy + rz * zz

    def band_start(l):
        """Scalar (y_lo, x_lo) in padded coords from the 4 tile corners."""
        d = plane_ref[l, 0]
        ph = plane_ref[l, 1]
        pw = plane_ref[l, 2]
        fx_min = jnp.float32(np.inf)
        fy_min = jnp.float32(np.inf)
        for (ci, cj) in ((0.0, 0.0), (0.0, TILE_C - 1.0), (TILE_R - 1.0, 0.0), (TILE_R - 1.0, TILE_C - 1.0)):
            cjj = j0 + cj
            cii = i0 + ci
            crx = A0 * cjj + B0 * cii + C0
            cry = A1 * cjj + B1 * cii + C1
            crz = A2 * cjj + B2 * cii + C2
            sd = (d - ez) / crz
            fx = ((ex + crx * sd) / pw + 0.5) * (tex_w - 1)
            fy = ((ey + cry * sd) / ph + 0.5) * (tex_h - 1)
            fx_min = jnp.minimum(fx_min, fx)
            fy_min = jnp.minimum(fy_min, fy)
        y_lo = jnp.floor(fy_min).astype(jnp.int32) - 1 + band_y
        x_lo = jnp.floor(fx_min).astype(jnp.int32) - 1 + band_x
        y_lo = jnp.clip(y_lo, 0, tex_h + band_y)
        x_lo = jnp.clip(x_lo, 0, tex_w + band_x)
        return y_lo, x_lo

    def dma(slot, l, y_lo, x_lo):
        return pltpu.make_async_copy(
            tex_ref.at[v, l, pl.ds(y_lo, band_y), pl.ds(x_lo, band_x), :],
            patch_buf.at[slot],
            sems.at[slot],
        )

    y0_, x0_ = band_start(0)
    dma(0, 0, y0_, x0_).start()

    def body(l, carry):
        color, depth_acc, trans, y_lo, x_lo = carry
        slot = l % 2

        ny, nx = band_start(jnp.minimum(l + 1, n_planes - 1))

        @pl.when(l + 1 < n_planes)
        def _():
            dma((l + 1) % 2, l + 1, ny, nx).start()

        dma(slot, l, y_lo, x_lo).wait()
        patch = patch_buf[slot]  # [By, Bx, 4]

        d = plane_ref[l, 0]
        ph = plane_ref[l, 1]
        pw = plane_ref[l, 2]
        sd = (d - ez) * inv_rz
        fx = ((ex + rx * sd) / pw + 0.5) * (tex_w - 1)
        fy = ((ey + ry * sd) / ph + 0.5) * (tex_h - 1)
        fx_rel = fx - (x_lo - band_x).astype(jnp.float32)
        fy_rel = fy - (y_lo - band_y).astype(jnp.float32)

        p = TILE_R * TILE_C
        fxf = fx_rel.reshape(p, 1)
        fyf = fy_rel.reshape(p, 1)
        ix = lax.broadcasted_iota(jnp.int32, (p, band_x), 1).astype(jnp.float32)
        iy = lax.broadcasted_iota(jnp.int32, (p, band_y), 1).astype(jnp.float32)
        hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(fxf - ix))  # [P, Bx]
        hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(fyf - iy))  # [P, By]

        pm = patch.transpose(1, 0, 2).reshape(band_x, band_y * 4)
        mixed = jnp.dot(hat_x, pm, preferred_element_type=jnp.float32)  # [P, By*4]
        mixed = mixed.reshape(p, band_y, 4)
        sample = jnp.sum(hat_y[:, :, None] * mixed, axis=1)  # [P, 4]

        rgb = sample[:, :3].reshape(TILE_R, TILE_C, 3)
        alpha = sample[:, 3].reshape(TILE_R, TILE_C, 1)
        depth_pix = (sd * rdotz)[..., None]

        w = trans * alpha
        color = color + w * rgb
        depth_acc = depth_acc + w * depth_pix
        trans = trans * (1.0 - alpha + COMPOSITE_EPS)
        return color, depth_acc, trans, ny, nx

    init = (
        jnp.zeros((TILE_R, TILE_C, 3), jnp.float32),
        jnp.zeros((TILE_R, TILE_C, 1), jnp.float32),
        jnp.ones((TILE_R, TILE_C, 1), jnp.float32),
        y0_,
        x0_,
    )
    color, depth_acc, _, _, _ = lax.fori_loop(0, n_planes, body, init)
    color_ref[0] = color
    depth_ref[0] = depth_acc


def render_mpi_fused_fwd(
    rgba: jnp.ndarray,  # [V, L, 4, Th, Tw]
    dhw: jnp.ndarray,  # [L, 3]
    c2w: jnp.ndarray,  # [V, 4, 4]
    z_dir: jnp.ndarray,  # [V, 3]
    focal: float,
    img_h: int,
    img_w: int,
    band_y: int = 32,
    band_x: int = 192,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused forward render -> (color [V,3,H,W] in [0,1], depth [V,1,H,W])."""
    v, l, _, th, tw = rgba.shape
    tile_r = TILE_R if img_h % TILE_R == 0 else 1
    tile_c = TILE_C if img_w % TILE_C == 0 else img_w
    nty, ntx = img_h // tile_r, img_w // tile_c

    a, b, c = _ray_basis(focal, img_h, img_w, c2w)
    eye = c2w[:, :3, 3]
    view_scalars = jnp.concatenate([a, b, c, eye, z_dir], axis=1).astype(jnp.float32)
    plane_scalars = dhw.astype(jnp.float32)

    # channels-last zero-padded texture for banded DMA
    texl = jnp.pad(
        rgba.transpose(0, 1, 3, 4, 2),
        ((0, 0), (0, 0), (band_y, band_y), (band_x, band_x), (0, 0)),
    ).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(v, nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # texture (manual DMA)
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r, tile_c, 3), lambda vi, ti, tj, *_: (vi, ti, tj, 0)),
            pl.BlockSpec((1, tile_r, tile_c, 1), lambda vi, ti, tj, *_: (vi, ti, tj, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, band_y, band_x, 4), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _kernel, n_planes=l, band_y=band_y, band_x=band_x, tex_h=th, tex_w=tw,
        tile_r=tile_r, tile_c=tile_c,
    )
    color, depth = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((v, img_h, img_w, 3), jnp.float32),
            jax.ShapeDtypeStruct((v, img_h, img_w, 1), jnp.float32),
        ],
        interpret=interpret,
    )(view_scalars, plane_scalars, texl)
    return color.transpose(0, 3, 1, 2), depth.transpose(0, 3, 1, 2)

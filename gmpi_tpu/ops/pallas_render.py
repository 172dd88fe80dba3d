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

Mosaic layout notes: every tensor lives in a (P, lanes) layout (P = pixels of
one tile) — Mosaic does not support minor-dim reshapes like (8,128)->(1024,1),
so pixel indices come from integer iota div/mod, the texture is pre-fused to
``[V, L, Wp, Hp*C]`` (x-major, (y, c) interleaved in lanes) so patches arrive
DMA-ready as ``[Bx, By*C]`` matmul operands, and the y-mix uses lane-masked
reductions instead of a reshape.

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

# default output tile (TILE_C shrinks for small images)
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
    tex_ref,  # [V, L, Wp, Hp*4] fp32 (ANY — manual DMA; x-major fused layout)
    color_ref,  # out block [1, 1, 1, P, 3]
    depth_ref,  # out block [1, 1, 1, P, 1]
    patch_buf,  # VMEM scratch [2, Bx, By*4]
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
    v = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    A0, A1, A2 = view_ref[v, 0], view_ref[v, 1], view_ref[v, 2]
    B0, B1, B2 = view_ref[v, 3], view_ref[v, 4], view_ref[v, 5]
    C0, C1, C2 = view_ref[v, 6], view_ref[v, 7], view_ref[v, 8]
    ex, ey, ez = view_ref[v, 9], view_ref[v, 10], view_ref[v, 11]
    zx, zy, zz = view_ref[v, 12], view_ref[v, 13], view_ref[v, 14]

    i0 = (ti * tile_r).astype(jnp.float32)
    j0 = (tj * tile_c).astype(jnp.float32)
    p = tile_r * tile_c

    # --- per-tile ray field in (P, 1) layout ------------------------------
    pidx = lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    ii = (pidx // tile_c).astype(jnp.float32) + i0
    jj = (pidx % tile_c).astype(jnp.float32) + j0
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
        for (ci, cj) in ((0.0, 0.0), (0.0, tile_c - 1.0), (tile_r - 1.0, 0.0), (tile_r - 1.0, tile_c - 1.0)):
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
        # HBM DMA slices must be tile-aligned: lanes (y*4) to 128 -> y to 32;
        # sublanes (x) to 8.  Bands carry the alignment slack.
        y_lo = (y_lo // 32) * 32
        x_lo = (x_lo // 8) * 8
        y_lo = jnp.clip(y_lo, 0, ((tex_h + band_y) // 32) * 32)
        x_lo = jnp.clip(x_lo, 0, ((tex_w + band_x) // 8) * 8)
        return y_lo, x_lo

    def dma(slot, l, y_lo, x_lo):
        # fused layout: lanes are (y, c) pairs -> y slice scales by 4.
        # band_start aligns y_lo to 32 and x_lo to 8; the compiler needs the
        # pl.multiple_of hints to accept the tiled-memref slice.
        return pltpu.make_async_copy(
            tex_ref.at[
                v, l,
                pl.ds(pl.multiple_of(x_lo, 8), band_x),
                pl.ds(pl.multiple_of(y_lo * 4, 128), band_y * 4),
            ],
            patch_buf.at[slot],
            sems.at[slot],
        )

    y0_, x0_ = band_start(0)
    dma(0, 0, y0_, x0_).start()

    lane4 = lax.broadcasted_iota(jnp.int32, (p, band_y * 4), 1)
    y_of_lane = (lane4 // 4).astype(jnp.float32)
    c_of_lane = lane4 % 4
    ix = lax.broadcasted_iota(jnp.int32, (p, band_x), 1).astype(jnp.float32)

    def body(l, carry):
        color, depth_acc, trans, y_lo, x_lo = carry
        slot = l % 2

        ny, nx = band_start(jnp.minimum(l + 1, n_planes - 1))

        @pl.when(l + 1 < n_planes)
        def _():
            dma((l + 1) % 2, l + 1, ny, nx).start()

        dma(slot, l, y_lo, x_lo).wait()
        patch = patch_buf[slot]  # [Bx, By*4]

        d = plane_ref[l, 0]
        ph = plane_ref[l, 1]
        pw = plane_ref[l, 2]
        sd = (d - ez) * inv_rz  # (P, 1)
        fx = ((ex + rx * sd) / pw + 0.5) * (tex_w - 1)
        fy = ((ey + ry * sd) / ph + 0.5) * (tex_h - 1)
        fx_rel = fx - (x_lo - band_x).astype(jnp.float32)  # (P, 1)
        fy_rel = fy - (y_lo - band_y).astype(jnp.float32)

        hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(fx_rel - ix))  # (P, Bx)
        mixed = jax.lax.dot_general(
            hat_x, patch, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (P, By*4)

        # y-mix via lane-masked reductions (no reshape): lane = y*4 + c
        hat_y4 = jnp.maximum(0.0, 1.0 - jnp.abs(fy_rel - y_of_lane))  # (P, By*4)
        prod = mixed * hat_y4
        r = jnp.sum(jnp.where(c_of_lane == 0, prod, 0.0), axis=1, keepdims=True)
        g = jnp.sum(jnp.where(c_of_lane == 1, prod, 0.0), axis=1, keepdims=True)
        b = jnp.sum(jnp.where(c_of_lane == 2, prod, 0.0), axis=1, keepdims=True)
        alpha = jnp.sum(jnp.where(c_of_lane == 3, prod, 0.0), axis=1, keepdims=True)
        rgb = jnp.concatenate([r, g, b], axis=1)  # (P, 3)

        depth_pix = sd * rdotz  # (P, 1)

        w = trans * alpha
        color = color + w * rgb
        depth_acc = depth_acc + w * depth_pix
        trans = trans * (1.0 - alpha + COMPOSITE_EPS)
        return color, depth_acc, trans, ny, nx

    init = (
        jnp.zeros((p, 3), jnp.float32),
        jnp.zeros((p, 1), jnp.float32),
        jnp.ones((p, 1), jnp.float32),
        y0_,
        x0_,
    )
    color, depth_acc, _, _, _ = lax.fori_loop(0, n_planes, body, init)
    color_ref[0, 0, 0] = color
    depth_ref[0, 0, 0] = depth_acc


def render_mpi_fused_fwd(
    rgba: jnp.ndarray,  # [V, L, 4, Th, Tw]
    dhw: jnp.ndarray,  # [L, 3]
    c2w: jnp.ndarray,  # [V, 4, 4]
    z_dir: jnp.ndarray,  # [V, 3]
    focal: float,
    img_h: int,
    img_w: int,
    band_y: int = 64,
    band_x: int = 200,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused forward render -> (color [V,3,H,W] in [0,1], depth [V,1,H,W]).

    ``band_y`` must be a multiple of 32 and ``band_x`` of 8 (HBM tile
    alignment), and both must cover the per-tile source span PLUS the
    alignment slack (band_start aligns down by up to 31 rows / 7 cols)."""
    assert band_y % 32 == 0 and band_x % 8 == 0, (band_y, band_x)
    v, l, _, th, tw = rgba.shape
    tile_r = TILE_R if img_h % TILE_R == 0 else 1
    tile_c = TILE_C if img_w % TILE_C == 0 else img_w
    nty, ntx = img_h // tile_r, img_w // tile_c
    p = tile_r * tile_c

    a, b, c = _ray_basis(focal, img_h, img_w, c2w)
    eye = c2w[:, :3, 3]
    view_scalars = jnp.concatenate([a, b, c, eye, z_dir], axis=1).astype(jnp.float32)
    plane_scalars = dhw.astype(jnp.float32)

    # x-major fused texture: [V, L, Wp, Hp*4] with lanes = (y, c) interleaved,
    # zero-padded by the band on each side
    texl = jnp.pad(
        rgba.transpose(0, 1, 4, 3, 2),  # [V, L, Tw, Th, 4]
        ((0, 0), (0, 0), (band_x, band_x), (band_y, band_y), (0, 0)),
    ).astype(jnp.float32)
    texl = texl.reshape(v, l, tw + 2 * band_x, (th + 2 * band_y) * 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(v, nty, ntx),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # texture (manual DMA)
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, p, 3), lambda vi, ti, tj, *_: (vi, ti, tj, 0, 0)),
            pl.BlockSpec((1, 1, 1, p, 1), lambda vi, ti, tj, *_: (vi, ti, tj, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, band_x, band_y * 4), jnp.float32),
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
            jax.ShapeDtypeStruct((v, nty, ntx, p, 3), jnp.float32),
            jax.ShapeDtypeStruct((v, nty, ntx, p, 1), jnp.float32),
        ],
        interpret=interpret,
    )(view_scalars, plane_scalars, texl)

    def unpack(x, ch):
        x = x.reshape(v, nty, ntx, tile_r, tile_c, ch)
        return x.transpose(0, 5, 1, 3, 2, 4).reshape(v, ch, img_h, img_w)

    return unpack(color, 3), unpack(depth, 1)

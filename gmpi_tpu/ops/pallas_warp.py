"""Fused MPI warp+composite Pallas kernel — the round-2 production renderer.

Replaces the XLA tile-banded warp (``ops/tiled_warp.py``) on the forward hot
path.  Round-1 profiling showed the XLA formulation is bound by materializing
``[P, Bx]`` hat matrices to HBM (~35 GB/chunk) and the adjoint's band-area x
tile-area matmuls.  This kernel exploits that the GMPI homography is
*near-identity* (warp slope s ~ 0.86-0.96 for the confined volume,
``gmpi/utils/mpi_utils.py:787-917`` semantics): the bilinear taps of output
pixel ``(i, j)`` live on a narrow diagonal band ``tex[i + dy, j + dx]`` with
``dx in [0, D_X)``, ``dy in [0, D_Y)`` after per-tile integer rebasing, so the
warp becomes a short static sum of shifted fused multiply-adds on the VPU —
exact fp32, no gathers, no hat matmuls, no HBM intermediates.

Per (view, 16-row output strip) grid step, looping planes front-to-back:

1. one strided DMA pulls the plane's texture row band
   ``tex_pad[l, :, y_lo:y_lo+BY_PAD, :]`` into a double-buffered VMEM slot
   (texture pre-padded by 8 texels on every side: zeros-padding semantics of
   ``grid_sample(padding_mode="zeros")`` come free — out-of-range taps read
   real zeros, ``gmpi/core/mpi.py:136-142``);
2. per 128-pixel tile: coords ``fx = Ax*rx + Bx`` from the per-plane affine
   decomposition of the homography (``gmpi/core/mpi.py:74-99``), diagonal
   bases ``cx = floor(min(fx - j)) - 1`` / ``ry`` via vector-min, window
   rebase by one dynamic lane-roll + 8-aligned sublane slice;
3. taps accumulate ``sum_{dy,dx} hat_y*hat_x*W[:, dy+i, dx+j]`` — static
   slices, one [4,16,128] FMA each;
4. in-register over-composite (weights ``alpha*cumprod(1-alpha+eps)``,
   ``gmpi/core/mpi.py:421-434``) with optional transmittance early-out.

Outputs slab partials ``(color_pre, depth_pre, trans)`` (combinable with
``gmpi_tpu.core.renderer.combine_segments``) plus the warped RGBA stack as
the residual for the custom-VJP backward.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 8            # zero-pad texels on each texture edge (x left)
STRIP = 16         # output rows per grid step
PADY_TOP = PAD + STRIP   # diagonal row base can sit up to STRIP above row 0
PADY_BOT = 72            # DMA window never clamps: requires by_pad <= PADY_BOT
LANES = 128        # output pixels per tile
WIN_X = 256        # rebased window lanes (covers 128*s + D_X)
WIN_SRC = 512      # static window sliced from the strip before rolling
EPS = 1e-10        # composite epsilon (gmpi/core/mpi.py:421)


class FusedBands(NamedTuple):
    """Static band config of the fused kernel for one plane chunk."""
    d_x: int       # static dx tap range (diagonal x band)
    d_y: int       # static dy tap range (includes 8-align slack)
    by_pad: int    # DMA'd texture rows per strip (multiple of 8)


def plane_affine(dhw, eye_pos, tex_h, tex_w):
    """Per-plane affine coefficients of the homography texel coords.

    ``fx = Ax * rx + Bx`` with ``rx = ray_x / ray_z`` (per-pixel, shared by
    all planes of a view) — the affine split of ``gmpi/core/mpi.py:74-99``
    with align_corners=True unnormalization.

    dhw [L, 3], eye_pos [3] -> scal [L, 6] f32:
      (Ax, Bx, Ay, By, dscale, 0) with dscale = d_l - eye_z.
    """
    d = dhw[:, 0]
    h = dhw[:, 1]
    w = dhw[:, 2]
    dscale = d - eye_pos[2]
    ax = (tex_w - 1.0) * dscale / w
    bx = (tex_w - 1.0) * (eye_pos[0] / w + 0.5)
    ay = (tex_h - 1.0) * dscale / h
    by = (tex_h - 1.0) * (eye_pos[1] / h + 0.5)
    zero = jnp.zeros_like(d)
    return jnp.stack([ax, bx + zero, ay, by + zero, dscale, zero],
                     axis=-1).astype(jnp.float32)


def ray_fields(ray_dir, z_dir):
    """Per-pixel plane-independent ray fields (rx, ry, q) [V, H, W].

    ``rx/ry = ray_{x,y}/ray_z``; ``q = (ray . z_dir)/ray_z`` so that
    ``depth_l = (d_l - eye_z) * q`` (``gmpi/core/mpi.py:148-152``).
    """
    rz = ray_dir[:, 2]
    rx = ray_dir[:, 0] / rz
    ry = ray_dir[:, 1] / rz
    q = jnp.einsum("vchw,vc->vhw", ray_dir, z_dir, precision="highest") / rz
    return rx, ry, q


def _plane_spans(scal, rx, ry):
    """Per-plane diagonal spans (host helper).

    -> (span_x [L], span_y_tile [L], span_y_strip [L]) where span_x/span_y
    are the worst per-tile diagonal tap spans and span_y_strip the worst
    per-strip one (sizes the DMA row band)."""
    scal = np.asarray(scal)
    rx = np.asarray(rx)
    ry = np.asarray(ry)
    if scal.ndim == 2:
        scal = scal[None]
    v, h, w = rx.shape
    n_l = scal.shape[1]
    j = np.arange(w, dtype=np.float32)[None, :]
    i = np.arange(STRIP, dtype=np.float32)[None, :, None]
    sx = np.zeros(n_l)
    sy = np.zeros(n_l)
    sy_strip = np.zeros(n_l)

    def tile_span(diag, tile_w, axis_blocks):
        # diag [H, W] with inf at invalid pixels; max over blocks of
        # (finite max - min)
        best = 0.0
        for t in range(axis_blocks):
            sl = diag[:, t * tile_w:(t + 1) * tile_w]
            lo = sl.min()
            hi = np.where(np.isinf(sl), -np.inf, sl).max()
            if np.isfinite(hi - lo):
                best = max(best, float(hi - lo))
        return best

    for vi in range(v):
        for l in range(n_l):
            s = scal[vi, l]
            fx = s[0] * rx[vi] + s[1]
            fy = s[2] * ry[vi] + s[3]
            fxd = np.where(fx < -1.0, np.inf, fx) - j
            fyd = np.where(fy < -1.0, np.inf, fy)
            sx[l] = max(sx[l], tile_span(fxd, LANES, w // LANES))
            fyd3 = fyd.reshape(h // STRIP, STRIP, w) - i
            for si in range(h // STRIP):
                sl = fyd3[si]
                lo = sl.min()
                hi = np.where(np.isinf(sl), -np.inf, sl).max()
                if np.isfinite(hi - lo):
                    sy_strip[l] = max(sy_strip[l], float(hi - lo))
                sy[l] = max(sy[l], tile_span(sl, LANES, w // LANES))
    return sx, sy, sy_strip


def _bands_from_spans(span_x, span_y, span_y_strip, margin: int = 2) -> FusedBands:
    d_x = int(np.ceil(max(span_x))) + 3 + margin
    # window starts are 8-aligned: dy carries the slack
    d_y = int(np.ceil(max(span_y))) + 3 + margin + 8
    by_pad = STRIP + int(np.ceil(max(span_y_strip))) + 3 + margin + 16
    by_pad = max(by_pad, STRIP + d_y + 8)
    by_pad = ((by_pad + 7) // 8) * 8
    return FusedBands(d_x=d_x, d_y=d_y, by_pad=by_pad)


def estimate_fused_bands(scal, rx, ry, margin: int = 2) -> FusedBands:
    """Measure the diagonal band sizes a (chunk, pose set) needs (host helper,
    the fused-kernel analog of ``tiled_warp.required_bands``)."""
    sx, sy, sys_ = _plane_spans(scal, rx, ry)
    return _bands_from_spans(sx, sy, sys_, margin)


def plan_fused_render(scal, rx, ry, margin: int = 2, max_chunks: int = 8,
                      grow_factor: float = 1.35):
    """Adaptive plane chunking for the fused renderer (host helper).

    Groups contiguous planes so each chunk's static tap loops fit its
    planes' actual diagonal spans — the background plane (huge extents,
    warp slope ~0.5) gets its own small chunk instead of inflating
    everyone's ``d_x``.  Returns ``[(lo, hi, FusedBands), ...]``.
    """
    sx, sy, sys_ = _plane_spans(scal, rx, ry)
    n_l = len(sx)
    cost = (sx + 5) * (sy + 13)  # relative per-plane tap cost
    bounds = [0]
    cur = cost[0]
    for l in range(1, n_l):
        if cost[l] > cur * grow_factor or cur > cost[l] * grow_factor:
            bounds.append(l)
            cur = cost[l]
        else:
            cur = max(cur, cost[l])
    bounds.append(n_l)
    # cap chunk count by merging cheapest-adjacent boundaries
    while len(bounds) - 1 > max_chunks:
        best_i, best_pen = 1, None
        for bi in range(1, len(bounds) - 1):
            lo, mid, hi = bounds[bi - 1], bounds[bi], bounds[bi + 1]
            merged = (hi - lo) * cost[lo:hi].max()
            split = (mid - lo) * cost[lo:mid].max() + (hi - mid) * cost[mid:hi].max()
            pen = merged - split
            if best_pen is None or pen < best_pen:
                best_i, best_pen = bi, pen
        bounds.pop(best_i)
    plan = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        plan.append((lo, hi, _bands_from_spans(
            sx[lo:hi], sy[lo:hi], sys_[lo:hi], margin)))
    return plan


def pad_textures(rgba):
    """[..., 4, Th, Tw] -> zero-padded [..., 4, Th+PADY_TOP+PADY_BOT, Wp].

    Rows get PADY_TOP above (the diagonal row base ``min(fy - i)`` reaches up
    to STRIP rows above the first tap) and PADY_BOT below (so the strip DMA
    never clamps at the bottom edge); the width is padded to the next
    multiple of 128 past Tw+2*PAD because DMA slices must be lane-aligned.
    All pad texels are zeros, which *is* the ``padding_mode="zeros"``
    sampling semantics — out-of-range taps read them.
    """
    tw = rgba.shape[-1]
    wp = ((tw + 2 * PAD + 127) // 128) * 128
    pad = [(0, 0)] * (rgba.ndim - 2) + [(PADY_TOP, PADY_BOT), (PAD, wp - tw - PAD)]
    return jnp.pad(rgba, pad)


def _fwd_kernel(scal_ref, rx_ref, ry_ref, q_ref, cin_ref, din_ref, tin_ref,
                tex_ref,
                color_ref, depth_ref, trans_ref, warped_ref,
                buf, sems, *, L, tex_h, tex_w, bands: FusedBands,
                early_out: bool, eps: float):
    d_x, d_y, by_pad = bands.d_x, bands.d_y, bands.by_pad
    rw = STRIP + d_y
    wp = tex_ref.shape[3]
    win_src = min(WIN_SRC, wp)
    win_x = min(WIN_X, win_src)
    w_img = rx_ref.shape[2]
    n_tiles = w_img // LANES
    f32 = jnp.float32
    vi = pl.program_id(0)

    ry_full = ry_ref[0]          # [STRIP, W]
    rx_full = rx_ref[0]
    q_full = q_ref[0]

    i_iota = lax.broadcasted_iota(jnp.int32, (STRIP, LANES), 0).astype(f32)
    j_iota = lax.broadcasted_iota(jnp.int32, (STRIP, LANES), 1).astype(f32)

    i_full = lax.broadcasted_iota(jnp.int32, (STRIP, w_img), 0).astype(f32)

    def y_lo_aligned(l):
        """Texture-row DMA start (padded coords, 8-aligned) for plane l.

        Based on the *diagonal* min ``floor(min(fy - i)) - 1`` so per-tile
        window bases (same diagonal rebasing) are never below the strip."""
        ay = scal_ref[0, l, 2]
        by = scal_ref[0, l, 3]
        fy = ay * ry_full + by
        fy_m = jnp.where(fy < -1.0, 1e9, fy) - i_full
        y_exact = jnp.floor(jnp.min(fy_m)).astype(jnp.int32) - 1  # texel coords
        y0 = jnp.clip(y_exact + PADY_TOP, 0, tex_h + PADY_TOP + PADY_BOT - by_pad)
        return pl.multiple_of((y0 // 8) * 8, 8)

    def dma(l, slot):
        y0 = y_lo_aligned(l)
        return pltpu.make_async_copy(
            tex_ref.at[pl.ds(vi * L + l, 1), :, pl.ds(y0, by_pad), :],
            buf.at[:, :, pl.ds(slot * by_pad, by_pad), :],
            sems.at[slot],
        )

    dma(0, 0).start()

    # over-compositing continues from the previous (nearer) plane slab
    acc_rgb0 = cin_ref[0]
    acc_d0 = din_ref[0]
    acc_t0 = tin_ref[0]

    def compute_plane(l, slot, acc_rgb, acc_d, acc_t):
        ax = scal_ref[0, l, 0]
        bx = scal_ref[0, l, 1]
        ay = scal_ref[0, l, 2]
        by = scal_ref[0, l, 3]
        dsc = scal_ref[0, l, 4]
        y0 = y_lo_aligned(l)  # recompute (cheap scalar path)

        parts = []
        for t in range(n_tiles):
            js = slice(t * LANES, (t + 1) * LANES)
            fx = ax * rx_full[:, js] + bx
            fy = ay * ry_full[:, js] + by
            # diagonal bases from valid pixels only
            fx_m = jnp.where(fx < -1.0, 1e9, fx)
            fy_m = jnp.where(fy < -1.0, 1e9, fy)
            cx = jnp.floor(jnp.min(fx_m - j_iota)).astype(jnp.int32) - 1
            ryb = jnp.floor(jnp.min(fy_m - i_iota)).astype(jnp.int32) - 1
            # window rows: strip row of texel row r is r + PADY_TOP - y0
            ry2 = jnp.clip(ryb + PADY_TOP - y0, 0, by_pad - rw)
            row0 = pl.multiple_of(slot * by_pad + (ry2 // 8) * 8, 8)
            ry2a = row0 - slot * by_pad
            s0 = min(max(t * LANES - 128, 0), wp - win_src)
            win = buf[0, :, pl.ds(row0, rw), s0:s0 + win_src]
            shift = cx + PAD - s0
            win = pltpu.roll(win, -shift, 2)[:, :, :win_x]
            # rebased fractional coords; pixels sampling left of the texture
            # pad would otherwise hit wrapped window lanes with nonzero hats
            fx_rel = jnp.where(fx < -1.0, -1e9, fx - (cx.astype(f32) + j_iota))
            fy_rel = fy - ((y0 - PADY_TOP + ry2a).astype(f32) + i_iota)
            wys = [jnp.maximum(0.0, 1.0 - jnp.abs(fy_rel - dy))[None]
                   for dy in range(d_y)]
            samp = jnp.zeros((4, STRIP, LANES), f32)
            for dx in range(d_x):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(fx_rel - dx))
                # one lane shift per dx; the dy slices below are sublane
                # offsets (free addressing on TPU)
                wsl = win[:, :, dx:dx + LANES]
                inner = wys[0] * wsl[:, 0:STRIP, :]
                for dy in range(1, d_y):
                    inner = inner + wys[dy] * wsl[:, dy:dy + STRIP, :]
                samp = samp + wx[None] * inner
            parts.append(samp)
        samp_full = jnp.concatenate(parts, axis=2)  # [4, STRIP, W]
        warped_ref[0, pl.ds(l, 1)] = samp_full[None]
        alpha = samp_full[3]
        wgt = alpha * acc_t
        acc_rgb = acc_rgb + wgt[None] * samp_full[:3]
        acc_d = acc_d + wgt * (dsc * q_full)
        acc_t = acc_t * (1.0 - alpha + eps)
        return acc_rgb, acc_d, acc_t

    def plane_body(l, carry):
        acc_rgb, acc_d, acc_t = carry
        slot = lax.rem(l, 2)

        @pl.when(l + 1 < L)
        def _():
            dma(l + 1, lax.rem(l + 1, 2)).start()

        dma(l, slot).wait()

        if early_out:
            def live(_):
                return compute_plane(l, slot, acc_rgb, acc_d, acc_t)

            def dead(_):
                warped_ref[0, pl.ds(l, 1)] = jnp.zeros(
                    (1, 4, STRIP, w_img), f32)
                return acc_rgb, acc_d, acc_t

            return lax.cond(jnp.max(acc_t) >= 1e-6, live, dead, 0)
        return compute_plane(l, slot, acc_rgb, acc_d, acc_t)

    acc_rgb, acc_d, acc_t = lax.fori_loop(
        0, L, plane_body, (acc_rgb0, acc_d0, acc_t0))
    color_ref[0] = acc_rgb
    depth_ref[0] = acc_d
    trans_ref[0] = acc_t


def warp_composite_fwd(
    tex_pad: jnp.ndarray,   # [V, L, 4, Th+24+72, Wp] zero-padded textures
    rx: jnp.ndarray,        # [V, H, W]
    ry: jnp.ndarray,
    q: jnp.ndarray,
    scal: jnp.ndarray,      # [V, L, 6]
    bands: FusedBands,
    early_out: bool = False,
    eps: float = EPS,
    interpret: bool = False,
    carry=None,             # (color_pre, depth_pre, trans) from nearer slabs
):
    """Slab partials + warped residual for one plane chunk.

    With ``carry`` the slab continues the over-composite of nearer planes
    (sequential chaining — lets ``early_out`` skip occluded far slabs);
    without it, partials start fresh and combine associatively via
    ``combine_segments``.

    Returns (color_pre [V,3,H,W], depth_pre [V,H,W], trans [V,H,W],
    warped [V,L,4,H,W]).
    """
    v, l_planes = tex_pad.shape[0], tex_pad.shape[1]
    tex_h = tex_pad.shape[3] - PADY_TOP - PADY_BOT
    tex_w = tex_h  # square textures; width padding beyond Tw+PAD is zeros
    assert bands.by_pad <= PADY_BOT, (bands, PADY_BOT)
    h, w_img = rx.shape[1], rx.shape[2]
    assert h % STRIP == 0 and w_img % LANES == 0, (h, w_img)
    n_strips = h // STRIP

    tex_flat = tex_pad.reshape(v * l_planes, 4, *tex_pad.shape[3:])
    if carry is None:
        cin = jnp.zeros((v, 3, h, w_img), jnp.float32)
        din = jnp.zeros((v, h, w_img), jnp.float32)
        tin = jnp.ones((v, h, w_img), jnp.float32)
    else:
        cin, din, tin = carry

    kernel = functools.partial(
        _fwd_kernel, L=l_planes, tex_h=tex_h, tex_w=tex_w, bands=bands,
        early_out=early_out, eps=eps)

    grid = (v, n_strips)
    out_shape = (
        jax.ShapeDtypeStruct((v, 3, h, w_img), jnp.float32),
        jax.ShapeDtypeStruct((v, h, w_img), jnp.float32),
        jax.ShapeDtypeStruct((v, h, w_img), jnp.float32),
        jax.ShapeDtypeStruct((v, l_planes, 4, h, w_img), jnp.float32),
    )
    color, depth, trans, warped = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, l_planes, 6), lambda vi, si: (vi, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, STRIP, w_img), lambda vi, si: (vi, si, 0)),
                pl.BlockSpec((1, STRIP, w_img), lambda vi, si: (vi, si, 0)),
                pl.BlockSpec((1, STRIP, w_img), lambda vi, si: (vi, si, 0)),
                pl.BlockSpec((1, 3, STRIP, w_img), lambda vi, si: (vi, 0, si, 0)),
                pl.BlockSpec((1, STRIP, w_img), lambda vi, si: (vi, si, 0)),
                pl.BlockSpec((1, STRIP, w_img), lambda vi, si: (vi, si, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((1, 3, STRIP, w_img), lambda vi, si: (vi, 0, si, 0)),
                pl.BlockSpec((1, STRIP, w_img), lambda vi, si: (vi, si, 0)),
                pl.BlockSpec((1, STRIP, w_img), lambda vi, si: (vi, si, 0)),
                pl.BlockSpec((1, l_planes, 4, STRIP, w_img),
                             lambda vi, si: (vi, 0, 0, si, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, 4, 2 * bands.by_pad, tex_pad.shape[4]), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(scal, rx, ry, q, cin, din, tin, tex_flat)
    return color, depth, trans, warped


def render_mpi_fused_fwd(
    rgba: jnp.ndarray,      # [V, L, 4, Th, Tw] in [0, 1]
    dhw: jnp.ndarray,       # [L, 3]
    ray_dir: jnp.ndarray,   # [V, 3, H, W]
    eye_pos: jnp.ndarray,   # [V, 3]
    z_dir: jnp.ndarray,     # [V, 3]
    plan,                   # from plan_fused_render (static)
    early_out: bool = True,
    eps: float = EPS,
    interpret: bool = False,
):
    """Full fused MPI render forward: chained slab kernels front-to-back.

    Returns (color [V,3,H,W], depth [V,1,H,W], trans [V,1,H,W],
    warped [V,L,4,H,W]) — warped is the residual stack for the backward.
    """
    v, l_planes = rgba.shape[0], rgba.shape[1]
    tex_h, tex_w = rgba.shape[3], rgba.shape[4]
    scal = jax.vmap(lambda e: plane_affine(dhw, e, tex_h, tex_w))(eye_pos)
    rx, ry, q = ray_fields(ray_dir.astype(jnp.float32), z_dir.astype(jnp.float32))
    tex_pad = pad_textures(rgba.astype(jnp.float32))
    carry = None
    warped_parts = []
    for lo, hi, bands in plan:
        c, d, t, w = warp_composite_fwd(
            tex_pad[:, lo:hi], rx, ry, q, scal[:, lo:hi], bands,
            early_out=early_out, eps=eps, interpret=interpret, carry=carry)
        carry = (c, d, t)
        warped_parts.append(w)
    color, depth, trans = carry
    warped = jnp.concatenate(warped_parts, axis=1)
    return color, depth[:, None], trans[:, None], warped

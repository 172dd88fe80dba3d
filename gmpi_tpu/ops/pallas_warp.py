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
PADY_BOT = 96            # DMA window never clamps: requires by_pad <= PADY_BOT
LANES = 128        # output pixels per tile
WIN_X = 256        # rebased window lanes (covers 128*s + D_X)
WIN_SRC = 512      # static window sliced from the strip before rolling
EPS = 1e-10        # composite epsilon (gmpi/core/mpi.py:421)
# Grad-safe occlusion threshold: plane gradients bounded by ~GRAD_TAU x
# |cotangent| x |values| are skipped/zeroed (see _fwd_kernel "grad" mode).
# Every amplification path divides by at most ONE (1 - a + eps) factor, and
# S = T/min-factor removes exactly that one, so the dropped mass is O(tau)
# absolute — 3 decades below the 5e-4 allclose gate at O(1) grad scales.
GRAD_TAU = 1e-7


class FusedBands(NamedTuple):
    """Static band config of the fused kernel for one plane chunk."""
    d_x: int       # static dx tap range (diagonal x band)
    d_y: int       # static dy tap range (includes 8-align slack)
    by_pad: int    # DMA'd texture rows per strip (multiple of 8)
    b_x: int = 0   # absolute texel-column band per 16x64 subtile (MXU path)
    b_x2: int = 0  # 16x128 PAIRED-subtile band (fat splat; 0 = no pairing —
                   # the span exceeds one 128-lane MXU tile for this chunk)


SUBW = 64          # pixel lanes per MXU subtile (16 rows x 64 cols)
WIN_SUB = 384      # static texture-lane window per subtile before rebasing
_FORCE_TRIM = None  # perf-probe override of warp_splat's trim auto-detect
_SPLAT_BACKEND = None  # None=auto, "fat", "classic" (perf probes/tests)
_COMP_BACKEND = None   # None=auto, "fat", "block" (perf probes/tests)
# perf-probe ONLY (results are wrong): ablate parts of the fat splat's
# inner loop to locate its cost.  None | "no_dot" | "no_acc" | "no_roll" |
# "no_hatx" | "no_haty" | "dot_f32"
_SPLAT_ABLATE = None


def _gc_strips(ns_total: int) -> int:
    """Cotangent strips per DMA group in the fat splat (largest of 8/4/2/1
    dividing the strip count)."""
    for gc in (8, 4, 2):
        if ns_total % gc == 0:
            return gc
    return 1


def win_rows(rw: int) -> int:
    """Window rows sliced per subtile: the slice start is 8-aligned (sublane
    granularity) and the diagonal base lands at row rem in [0, 8), so the
    window must hold rw + 7 rows, rounded to sublanes.  The y-hats are built
    against the ALIGNED base — rows outside [rem, rem+rw) have structurally
    zero hats — which removes the dynamic sublane roll entirely (one fewer
    [4, rwp, win] VPU pass per subtile, and 4*rwp stays within one 128-row
    MXU tile for rw <= 25)."""
    return ((rw + 7 + 7) // 8) * 8


def _dot_bf16x3(a, b, dims, k_axes=None):
    """fp32-faithful matmul from DEFAULT-precision bf16 contractions.

    Splits both operands ``x = hi + lo`` (hi = bf16(x), lo = bf16(x - hi)) and
    computes ``hi.hi + lo.hi + hi.lo`` (the dropped lo.lo term is <= 2^-18
    relative) — the HIGH/bf16x3 mode Mosaic does not lower on TPU, expressed
    manually from DEFAULT dots.

    ``k_axes=(a_k, b_k)``: contract the K-concatenation ``[a_hi | a_lo |
    a_hi] . [b_hi | b_hi | b_lo]`` in ONE matmul — the adds stay in the MXU's
    fp32 accumulator and K-padding to 128 often absorbs the 3x (K=72 ->
    216 -> 2 K-tiles vs HIGHEST's 6 passes).  Pays when K is far below a
    128-lane tile.  ``k_axes=None``: three separate dots summed on the VPU —
    cheaper when K is already tile-aligned and large (the concatenated
    operands would cost more VPU copies than the [M, N] output adds, e.g. the
    splat's K=1024 pixel contraction).
    """
    f32 = jnp.float32
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(f32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(f32)).astype(jnp.bfloat16)
    if k_axes is None:
        d = lambda x, y: lax.dot_general(
            x, y, dims, precision=lax.Precision.DEFAULT,
            preferred_element_type=f32)
        return d(a_hi, b_hi) + d(a_lo, b_hi) + d(a_hi, b_lo)
    a_cat = jnp.concatenate([a_hi, a_lo, a_hi], axis=k_axes[0])
    b_cat = jnp.concatenate([b_hi, b_hi, b_lo], axis=k_axes[1])
    return lax.dot_general(a_cat, b_cat, dims,
                           precision=lax.Precision.DEFAULT,
                           preferred_element_type=f32)


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
    sx_abs = np.zeros(n_l)   # absolute fx span over 16x64 subtiles (MXU hats)
    sx_abs2 = np.zeros(n_l)  # ... over 16x128 PAIRED subtiles (fat splat)
    sy2 = np.zeros(n_l)      # diagonal y span over paired subtiles

    def block_span(vals, rows, cols):
        """max over (rows x cols) blocks of (finite max - min); vals [H, W]
        with +inf at invalid pixels."""
        hh, ww = vals.shape
        b = vals.reshape(hh // rows, rows, ww // cols, cols)
        lo = b.min(axis=(1, 3))
        hi = np.where(np.isinf(b), -np.inf, b).max(axis=(1, 3))
        d = hi - lo
        d = d[np.isfinite(d)]
        return float(d.max()) if d.size else 0.0

    for vi in range(v):
        for l in range(n_l):
            s = scal[vi, l]
            fx = s[0] * rx[vi] + s[1]
            fy = s[2] * ry[vi] + s[3]
            fx_m = np.where(fx < -1.0, np.inf, fx)
            fxd = fx_m - j
            fyd = np.where(fy < -1.0, np.inf, fy)
            sx[l] = max(sx[l], block_span(fxd, STRIP, LANES))
            sx_abs[l] = max(sx_abs[l], block_span(fx_m, STRIP, SUBW))
            sx_abs2[l] = max(sx_abs2[l], block_span(fx_m, STRIP, 2 * SUBW))
            fyd3 = fyd.reshape(h // STRIP, STRIP, w) - i
            for si in range(h // STRIP):
                sl = fyd3[si]
                lo = sl.min()
                hi = np.where(np.isinf(sl), -np.inf, sl).max()
                if np.isfinite(hi - lo):
                    sy_strip[l] = max(sy_strip[l], float(hi - lo))
                # d_y at the kernel's rebase granularity (16x64 subtiles);
                # 128-lane spans doubled the band at strongly tilted poses
                sy[l] = max(sy[l], block_span(sl, STRIP, SUBW))
                sy2[l] = max(sy2[l], block_span(sl, STRIP, 2 * SUBW))
    return sx, sy, sy_strip, sx_abs, sx_abs2, sy2


def _bands_from_spans(span_x, span_y, span_y_strip, span_x_abs,
                      span_x_abs2=None, span_y2=None,
                      margin: int = 2) -> FusedBands:
    d_x = int(np.ceil(max(span_x))) + 3 + margin
    # window rows are rebased exactly via a sublane roll — no 8-align slack
    d_y = int(np.ceil(max(span_y))) + 3 + margin
    # the kernel slices rwp = round8(16 + d_y + 8) rows and clips the window
    # start to [0, by_pad - rwp]; size by_pad so the clip never binds
    rw = STRIP + d_y
    rwp = win_rows(rw)
    by_pad = STRIP + int(np.ceil(max(span_y_strip))) + 3 + margin + (rwp - rw) + 16
    by_pad = max(by_pad, rwp + 8)
    by_pad = ((by_pad + 7) // 8) * 8
    b_x = int(np.ceil(max(span_x_abs))) + 3 + margin
    b_x = ((b_x + 7) // 8) * 8
    b_x2 = 0
    if span_x_abs2 is not None:
        # paired 16x128 subtiles (fat splat): valid only when the wider
        # window still fits one MXU tile AND its y taps fit the rwp rows
        # the pair's hats reuse — coverage needs STRIP + span2 + 3 + rem
        # (< 8) rows from the 8-aligned base, i.e. span2 + 3 <= rwp - 23
        cand = int(np.ceil(max(span_x_abs2))) + 3 + margin
        cand = ((cand + 7) // 8) * 8
        if cand <= 128 and int(np.ceil(max(span_y2))) + 3 <= rwp - 23:
            b_x2 = cand
    return FusedBands(d_x=d_x, d_y=d_y, by_pad=by_pad, b_x=b_x, b_x2=b_x2)


def estimate_fused_bands(scal, rx, ry, margin: int = 2) -> FusedBands:
    """Measure the diagonal band sizes a (chunk, pose set) needs (host helper,
    the fused-kernel analog of ``tiled_warp.required_bands``)."""
    sx, sy, sys_, sxa, sxa2, sy2 = _plane_spans(scal, rx, ry)
    return _bands_from_spans(sx, sy, sys_, sxa, sxa2, sy2, margin)


def plan_fused_render(scal, rx, ry, margin: int = 2, max_chunks: int = 14,
                      overhead: float = 3000.0, max_chunk_planes: int = None):
    """Optimal plane chunking for the fused renderer (host helper).

    The kernel cost per (plane, tile) is ``d_x * (4*d_y + 7)`` vector ops
    with the chunk's *worst-case* bands, so grouping planes with different
    warp slopes inflates everyone's tap loops.  A DP segmentation minimizes
    ``sum_chunks planes * d_x * (4*d_y + 7) + overhead`` (overhead models
    the *traffic* of a chunk boundary: XLA materializes the per-chunk
    warped-residual concat, the d_samp slices, and extra texture-pad
    copies — measured at ~10 ms/boundary at 96x1024^2, far above launch
    cost, so the default strongly prefers merging chunks whose quantized
    bands match); the chunk count is capped by escalating the overhead
    term.  ``max_chunk_planes`` defaults to the VMEM bound of the fused
    kernel's double-buffered warped-residual out block (256 KB/plane/strip
    at 1024-wide images).  Returns ``[(lo, hi, FusedBands), ...]``.
    """
    sx, sy, sys_, sxa, sxa2, sy2 = _plane_spans(scal, rx, ry)
    n_l = len(sx)
    if max_chunk_planes is None:
        # measured on v5e (tools/probe_chunk_size.py, r4): the fused fwd
        # degrades monotonically with planes-per-call — 12 -> 35.7 ms,
        # 24 -> 52 ms, 95 -> 113 ms dense at 96x1024^2 — because large
        # warped out blocks flush at a fraction of HBM bandwidth.  12 is
        # the sweet spot; chunk-boundary slices are free since the kernels
        # index tex_pad/d_samp through their lo-offset DMA.  The VMEM
        # bound (double-buffered [L, 4, STRIP, w] warped block within the
        # 100 MB limit) caps it for narrow images.
        w_img = np.asarray(rx).shape[-1]
        vmem_cap = max(1, (88 * 1024 * 1024) // (2 * 4 * STRIP * w_img * 4))
        max_chunk_planes = min(12, vmem_cap)

    def chunk_cost(lo, hi, ov):
        # MXU-path per-plane cost model: hat builds scale with the subtile
        # band b_x and the window rows rw; the matmul rides along (overlapped).
        # Both are quantized exactly as the kernel quantizes them (8-lane
        # bands, win_rows sublane rounding) — the raw spans hid e.g. the
        # rw 25 -> 28 step that actually costs a full 32 -> 40 sublane jump.
        if hi - lo > max_chunk_planes:
            # bound the warped-residual output block (2x in VMEM): ~260 KB
            # per plane per strip at 1024^2
            return np.inf
        b_x = int(np.ceil(sxa[lo:hi].max())) + 3 + margin
        b_x = ((b_x + 7) // 8) * 8
        rw = STRIP + int(np.ceil(sy[lo:hi].max())) + 3 + margin
        return (hi - lo) * (3 * b_x + 7 * win_rows(rw)) + ov

    ov = overhead
    while True:
        best = np.full(n_l + 1, np.inf)
        best[0] = 0.0
        back = np.zeros(n_l + 1, dtype=int)
        for hi in range(1, n_l + 1):
            for lo in range(hi):
                c = best[lo] + chunk_cost(lo, hi, ov)
                if c < best[hi]:
                    best[hi] = c
                    back[hi] = lo
        bounds = [n_l]
        while bounds[-1] > 0:
            bounds.append(int(back[bounds[-1]]))
        bounds = bounds[::-1]
        if len(bounds) - 1 <= max_chunks:
            break
        ov *= 2.0
    plan = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        plan.append((lo, hi, _bands_from_spans(
            sx[lo:hi], sy[lo:hi], sys_[lo:hi], sxa[lo:hi],
            sxa2[lo:hi], sy2[lo:hi], margin)))
    return plan


def fused_bands_ok(scal, rx, ry, plan) -> jnp.ndarray:
    """Jittable out-of-band check for a fused-render plan: True iff every
    (plane, subtile) of every chunk fits its static bands.

    Conditions mirrored from the kernels (clamps that only ever drop
    zero-pad taps are exact by construction and not checked):

    * x: per-16x64-subtile absolute fx span + 3 <= b_x;
    * y: per-subtile diagonal fy span + 3 <= d_y, and the strip's window
      bases stay inside the by_pad DMA band including the 8-align slack.

    Cheap fused reductions — callers can run it once per pose batch
    (the runtime analogue of ``gmpi/core/mpi.py:381-395``).
    """
    rx = jnp.asarray(rx, jnp.float32)
    ry = jnp.asarray(ry, jnp.float32)
    v, h, w = rx.shape
    ns, nt = h // STRIP, w // SUBW
    i_arr = jnp.arange(STRIP, dtype=jnp.float32)[:, None, None]
    rx5 = rx.reshape(v, ns, STRIP, nt, SUBW)
    ry5 = ry.reshape(v, ns, STRIP, nt, SUBW)

    def plane_ok(s, rx_v, ry_v, bands: FusedBands):
        # s [6] paired with ITS view's rays [ns, STRIP, nt, SUBW] — the
        # kernel only ever applies scal[v] to rays[v]; checking every
        # (plane, view) cross pair made the batched check falsely fail
        rw = STRIP + bands.d_y
        rwp = win_rows(rw)
        fx = s[0] * rx_v + s[1]
        fy = s[2] * ry_v + s[3]
        fx_m = jnp.where(fx < -1.0, jnp.inf, fx)
        diag = jnp.where(fy < -1.0, jnp.inf, fy) - i_arr[None]
        # x: absolute span per subtile (invalid-only subtiles span 0)
        fx_hi = jnp.max(jnp.where(jnp.isinf(fx_m), -jnp.inf, fx_m), axis=(1, 3))
        fx_lo = jnp.min(fx_m, axis=(1, 3))
        span_x = jnp.where(jnp.isfinite(fx_hi - fx_lo), fx_hi - fx_lo, 0.0)
        ok = jnp.all(span_x + 3 <= bands.b_x)
        # y: diagonal span per subtile
        d_hi = jnp.max(jnp.where(jnp.isinf(diag), -jnp.inf, diag), axis=(1, 3))
        d_lo = jnp.min(diag, axis=(1, 3))                 # [ns, nt]
        span_y = jnp.where(jnp.isfinite(d_hi - d_lo), d_hi - d_lo, 0.0)
        ok &= jnp.all(span_y + 3 <= bands.d_y)
        # strip DMA coverage: every subtile's window base must sit within the
        # by_pad band given the strip base's 8-alignment slack
        ryb_sub = jnp.floor(d_lo) - 1                      # [ns, nt] (inf ok)
        y_exact = jnp.floor(jnp.min(d_lo, axis=1)) - 1     # [ns]
        rel = jnp.where(jnp.isfinite(ryb_sub), ryb_sub, -jnp.inf)
        rel = jnp.max(rel, axis=1) - y_exact               # [ns]
        strip_ok = jnp.where(jnp.isfinite(y_exact),
                             rel + 7 + rwp <= bands.by_pad, True)
        ok &= jnp.all(strip_ok)
        if bands.b_x2 and nt % 2 == 0:
            # paired 16x128 subtiles (fat splat): x span within b_x2 and
            # y span still within the shared d_y band
            fx2 = fx_m.reshape(ns, STRIP, nt // 2, 2 * SUBW)
            dg2 = diag.reshape(ns, STRIP, nt // 2, 2 * SUBW)
            fx2_hi = jnp.max(jnp.where(jnp.isinf(fx2), -jnp.inf, fx2),
                             axis=(1, 3))
            fx2_lo = jnp.min(fx2, axis=(1, 3))
            s2 = jnp.where(jnp.isfinite(fx2_hi - fx2_lo), fx2_hi - fx2_lo, 0.0)
            ok &= jnp.all(s2 + 3 <= bands.b_x2)
            d2_hi = jnp.max(jnp.where(jnp.isinf(dg2), -jnp.inf, dg2),
                            axis=(1, 3))
            d2_lo = jnp.min(dg2, axis=(1, 3))
            sy2s = jnp.where(jnp.isfinite(d2_hi - d2_lo), d2_hi - d2_lo, 0.0)
            ok &= jnp.all(sy2s + 3 <= rwp - 23)  # see _bands_from_spans
        return ok

    ok_all = jnp.bool_(True)
    scal = jnp.asarray(scal)
    for lo, hi, bands in plan:
        for vi in range(v):  # static: V is small
            # sequential map: vmapping would materialize [L, H, W] temps
            ok_all &= jnp.all(lax.map(
                lambda s: plane_ok(s, rx5[vi], ry5[vi], FusedBands(*bands)),
                scal[vi, lo:hi]))
    return ok_all


def pad_textures(rgba, pad_bot: int = PADY_BOT):
    """[..., 4, Th, Tw] -> zero-padded [..., 4, Th+PADY_TOP+pad_bot, Wp].

    Rows get PADY_TOP above (the diagonal row base ``min(fy - i)`` reaches up
    to STRIP rows above the first tap) and ``pad_bot >= by_pad`` below (so
    the strip DMA never clamps at the bottom edge); the width is padded to
    the next multiple of 128 past Tw+2*PAD because DMA slices must be
    lane-aligned.  All pad texels are zeros, which *is* the
    ``padding_mode="zeros"`` sampling semantics — out-of-range taps read
    them.
    """
    tw = rgba.shape[-1]
    wp = ((tw + 2 * PAD + 127) // 128) * 128
    if wp < 512:
        # dynamic lane rotates silently miscompile on v5e for widths that are
        # not powers of two; the kernel rolls min(512, wp)-wide windows, so
        # keep wp a power of two below 512 (extra pad columns are zeros)
        wp = 1 << (wp - 1).bit_length()
    pad = [(0, 0)] * (rgba.ndim - 2) + [(PADY_TOP, pad_bot), (PAD, wp - tw - PAD)]
    return jnp.pad(rgba, pad)


def flatten_pixels(x):
    """[..., H, W] -> [..., H//16, (W//64)*8, 128] in the kernel's
    subtile-flat layout.

    Pixel (strip s, row i = 8h + a, col st*64 + v) maps to flat
    (s, st*8 + a, h*64 + v): each 16x64 pixel subtile becomes one [8, 128]
    block — a full native vreg tile, so per-subtile hat tensors
    ``[B, 8, 128]`` waste no lanes (a [16, 64] slice would idle half of
    every vreg)."""
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    ns, nt = h // STRIP, w // SUBW
    nl = len(lead)
    y = x.reshape(*lead, ns, 2, 8, nt, SUBW)   # [..., s, h2, a, st, v]
    perm = tuple(range(nl)) + (nl, nl + 3, nl + 2, nl + 1, nl + 4)
    y = jnp.transpose(y, perm)                 # [..., s, st, a, h2, v]
    return y.reshape(*lead, ns, nt * 8, 2 * SUBW)


def unflatten_pixels(y, h, w):
    """Inverse of :func:`flatten_pixels`."""
    lead = y.shape[:-3]
    ns, nt = h // STRIP, w // SUBW
    nl = len(lead)
    x = y.reshape(*lead, ns, nt, 8, 2, SUBW)   # [..., s, st, a, h2, v]
    perm = tuple(range(nl)) + (nl, nl + 3, nl + 2, nl + 1, nl + 4)
    x = jnp.transpose(x, perm)                 # [..., s, h2, a, st, v]
    return x.reshape(*lead, h, w)


def subtile_base_mins(scal, rx_flat, ry_flat):
    """Per-(plane, strip, 8-row subtile) masked coordinate minima.

    Returns ``(mx, my) [V, L, NS, n_sub]`` f32.  The fused kernels derive
    their scalar window bases as ``floor(min) - 1`` of exactly these minima;
    computing them OUTSIDE the kernel (one fused XLA broadcast+reduce over
    tiny outputs) removes the per-subtile vector-reduce -> scalar-extract
    chains that dominate per-step machinery on v5e (~us-scale each).  Exact:
    ``min`` is order-insensitive and the escape masking ``where(f < -1.0,
    1e9, f)`` matches the in-kernel ops bit for bit; paired-subtile bases
    are elementwise mins of adjacent subtiles, and strip-level bases (the
    fwd DMA row) are mins over the subtile axis.
    """
    v, ns, r8, _ = rx_flat.shape
    n_sub = r8 // 8
    f32 = jnp.float32
    rx4 = rx_flat.reshape(v, 1, ns, n_sub, 8, LANES)
    ry4 = ry_flat.reshape(v, 1, ns, n_sub, 8, LANES)
    ax = scal[:, :, 0][:, :, None, None, None, None]
    bx = scal[:, :, 1][:, :, None, None, None, None]
    ay = scal[:, :, 2][:, :, None, None, None, None]
    by = scal[:, :, 3][:, :, None, None, None, None]
    i8 = (lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
          + 8 * (lax.broadcasted_iota(jnp.int32, (8, LANES), 1) // SUBW)
          ).astype(f32)
    fx = ax * rx4 + bx
    fy = ay * ry4 + by
    mx = jnp.min(jnp.where(fx < -1.0, 1e9, fx), axis=(-2, -1))
    my = jnp.min(jnp.where(fy < -1.0, 1e9, fy) - i8, axis=(-2, -1))
    return mx, my


def bases_from_mins(mx, my, pair: bool):
    """Integer window bases (cx, ryb) [V, L, NS, n_it] from subtile minima.

    Matches the in-kernel chain ``floor(min).astype(int32) - 1`` (any
    clipping stays in the kernel — it is band-config-dependent and scalar).
    """
    if pair:
        mx = jnp.minimum(mx[..., 0::2], mx[..., 1::2])
        my = jnp.minimum(my[..., 0::2], my[..., 1::2])
    cx = jnp.floor(mx).astype(jnp.int32) - 1
    ryb = jnp.floor(my).astype(jnp.int32) - 1
    return cx, ryb


def _fwd_kernel(scal_ref, rays_ref, *rest,
                L, tex_h, tex_w, pad_bot: int,
                bands: FusedBands, early_out: bool, eps: float,
                precision=lax.Precision.HIGHEST, compute_dtype=None,
                with_warped: bool = True, lo: int = 0, l_total=None,
                grad_carry: bool = False, with_disp: bool = False,
                init_state: bool = False):
    """Fused warp+composite, MXU formulation (r5 resident layout).

    Per (plane, 16x64 pixel subtile): slice + diagonally rebase a texture
    window ``[4, rwp, b_x]``, contract its texel *columns* against per-pixel
    x-hats on the MXU (``[4*rwp, b_x] @ [b_x, 8, 128]``), then contract the
    ``rw`` window *rows* against per-pixel y-hats on the VPU.  Exactly
    separable bilinear interpolation (hats have <=2 nonzeros per pixel and
    axis).  ``precision=HIGHEST`` (exact fp32 contraction) is the parity
    mode — Mosaic lowers only DEFAULT and HIGHEST dot precisions on TPU
    (HIGH/bf16x3 raises NotImplementedError at lowering, observed on v5e);
    the bf16 fast mode pairs ``compute_dtype=bf16`` with DEFAULT.

    I/O layout (r5): the r4 kernel moved ~12 small per-step pixel blocks
    per grid step — block-copy issue overhead was a first-order share of
    the 26 ms fwd floor.  Now the ray fields ride ONE per-view resident
    block ``[1, 3, NS, R8, 128]``, the composite state is ONE packed array
    ``[V, F, NS, R8, 128]`` (F = rgb,d[,p],t[,s,m]) staged through a VMEM
    scratch with a single manual DMA in/out per view, and the only
    per-step block left is the warped-residual flush.
    """
    # positional: scal (SMEM), rays (resident block), y0/cx/ryb (SMEM
    # bases) | [state_in (ANY)] | tex (ANY) | state_out (ANY), [warped
    # (block)], [nl (SMEM block, grad_carry)] | sscr, buf, sems, ssem,
    # live_s
    rest = list(rest)
    y0_ref, cxb_ref, rybb_ref = rest[:3]
    rest = rest[3:]
    state_in_any = None if init_state else rest.pop(0)
    tex_ref = rest.pop(0)
    state_out_any = rest.pop(0)
    warped_ref = rest.pop(0) if with_warped else None
    nl_ref = rest.pop(0) if grad_carry else None
    sscr, buf, sems, ssem, live_s = rest
    if l_total is None:
        l_total = L
    d_y, by_pad, b_xp = bands.d_y, bands.by_pad, bands.b_x
    rw = STRIP + d_y
    rwp = win_rows(rw)   # 8-aligned window start + rem<8 slack (no roll)
    wp = tex_ref.shape[3]
    win_w = min(WIN_SUB, wp)
    # the 128-aligned rebase leaves shift < 192 when the window start is
    # unclamped; when wp == win_w the window is the whole padded texture
    assert b_xp + 192 <= win_w or wp == win_w, (b_xp, win_w, wp)
    n_strips = rays_ref.shape[2]
    r8 = rays_ref.shape[3]          # (W//64)*8 flat rows per strip
    n_sub = r8 // 8
    f32 = jnp.float32
    vi = pl.program_id(0)
    si = pl.program_id(1)

    # field indices in the packed state
    idx_t = 4 + (1 if with_disp else 0)
    n_fields = idx_t + 1 + (2 if grad_carry else 0)

    if state_in_any is not None:
        @pl.when(si == 0)
        def _():
            # one contiguous [1, F, NS, R8, 128] copy per view
            cp = pltpu.make_async_copy(
                state_in_any.at[pl.ds(vi, 1)], sscr, ssem.at[0])
            cp.start()
            cp.wait()

    rx_full = rays_ref[0, 0, pl.ds(si, 1)][0]   # [R8, 128] subtile-flat
    ry_full = rays_ref[0, 1, pl.ds(si, 1)][0]
    q_full = rays_ref[0, 2, pl.ds(si, 1)][0]
    # expected disparity (``gmpi/core/mpi.py:431``): disp_l = 1/(dsc_l * q)
    # accumulated with the same weights as depth; computed as
    # (1/dsc) * (1/q) so the per-pixel reciprocal happens once per strip
    qinv_full = 1.0 / q_full if with_disp else None

    iota_x = lax.broadcasted_iota(jnp.int32, (b_xp, 8, LANES), 0).astype(f32)
    iota_r = lax.broadcasted_iota(jnp.int32, (rwp, 8, LANES), 0).astype(f32)

    def y_lo_aligned(l):
        """Texture-row DMA start (padded coords, 8-aligned) for plane l —
        precomputed outside the kernel (see subtile_base_mins)."""
        return pl.multiple_of(y0_ref[0, l, si], 8)

    def dma(l, slot):
        # lo/l_total: the texture stack holds ALL planes (chunked callers
        # index their slice here instead of materializing tex_pad[:, lo:hi])
        y0 = y_lo_aligned(l)
        return pltpu.make_async_copy(
            tex_ref.at[pl.ds(vi * l_total + lo + l, 1), :, pl.ds(y0, by_pad), :],
            buf.at[:, :, pl.ds(slot * by_pad, by_pad), :],
            sems.at[slot],
        )

    # over-compositing continues from the previous (nearer) plane slab.
    # The composite state lives in the packed VMEM scratch and is updated
    # IN PLACE per plane: accumulator updates gated by ``pl.when`` compile
    # to real branches, so dead planes skip their compute entirely.  (The
    # r4 design carried accumulators through a value-returning ``lax.cond``
    # — Mosaic lowers that as predicated select, BOTH branches execute, and
    # the measured sparse fwd equalled the dense one exactly.)
    if init_state:
        zero = jnp.zeros((r8, LANES), f32)
        one = jnp.ones((r8, LANES), f32)
        fields0 = [zero, zero, zero, zero]          # rgb + depth
        if with_disp:
            fields0.append(zero)
        fields0.append(one)                          # trans
        if grad_carry:
            fields0 += [one, one]                    # S, M
        sscr[0, :, pl.ds(si, 1)] = jnp.stack(fields0, axis=0)[:, None]
    if grad_carry:
        # S/M occlusion state carried ACROSS chunks (chunk-local state made
        # the skip useless for chunked plans: every chunk restarted S = 1,
        # so planes occluded by an earlier chunk were never skipped)
        if init_state:
            live_s[0] = 1
        else:
            sm = sscr[0, idx_t + 1:idx_t + 3, pl.ds(si, 1)]
            live_s[0] = jnp.where(
                jnp.max(sm[0, 0] / sm[1, 0]) >= GRAD_TAU, 1, 0)
        # chunk-local live-plane count: L if the strip never dies here,
        # else the plane index at the live->dead transition
        live_s[1] = jnp.where(live_s[0] == 1, L, 0)

        @pl.when(live_s[0] == 1)
        def _():
            dma(0, 0).start()
    else:
        if early_out:
            # gate the whole DMA chain on the carried transmittance (r4:
            # the ungated inference path measured 53.5 ms vs the gated grad
            # path's 29.7 — occluded planes' texture bands still streamed)
            if init_state:
                live_s[0] = 1
            else:
                t_in = sscr[0, idx_t, pl.ds(si, 1)][0]
                live_s[0] = jnp.where(jnp.max(t_in) >= 1e-6, 1, 0)
            live_s[1] = jnp.where(live_s[0] == 1, L, 0)

            @pl.when(live_s[0] == 1)
            def _():
                dma(0, 0).start()
        else:
            dma(0, 0).start()

    def compute_plane(l, slot):
        # Warp one plane and fold it into the composite state IN the scratch
        # (rgb, depth[, disp], trans[, S, M] at sscr[0, :, si]).  Callers
        # gate this whole function with ``pl.when(live)`` — a real branch,
        # so dead planes skip the warp+composite entirely.
        st_in = sscr[0, :, pl.ds(si, 1)]          # [F, 1, R8, 128]
        acc_rgb = st_in[0:3, 0]
        acc_d = st_in[3, 0]
        acc_p = st_in[4, 0] if with_disp else None
        acc_t = st_in[idx_t, 0]
        ax = scal_ref[0, l, 0]
        bx = scal_ref[0, l, 1]
        ay = scal_ref[0, l, 2]
        by = scal_ref[0, l, 3]
        dsc = scal_ref[0, l, 4]
        y0 = y_lo_aligned(l)  # recompute (cheap scalar path)

        cd = compute_dtype or f32
        parts = []
        for st in range(n_sub):
            rs = slice(st * 8, st * 8 + 8)
            fx = ax * rx_full[rs] + bx         # [8, 128] subtile pixels
            fy = ay * ry_full[rs] + by
            # absolute texel-column base; clamping keeps the window in the
            # padded texture — clamped-away taps are all zero-pad texels
            # (their hats vs the clamped base vanish or hit zeros).
            # Bases precomputed outside (subtile_base_mins): no per-subtile
            # vector-min -> scalar-extract in the hot loop.
            cx = jnp.clip(cxb_ref[0, l, si, st], -2, wp - PAD - b_xp)
            ryb = rybb_ref[0, l, si, st]
            ry2 = jnp.clip(ryb + PADY_TOP - y0, 0, by_pad - rwp)
            base8 = (ry2 // 8) * 8   # taps live at rows [ry2-base8, +rw) < rwp
            row0 = pl.multiple_of(slot * by_pad + base8, 8)
            # 128-aligned dynamic window start tracking this plane's slope
            cxp = cx + PAD
            s0d = jnp.clip(((cxp - 64) // 128) * 128, 0, wp - win_w)
            s0d = pl.multiple_of(s0d, 128)
            # no sublane roll: the y-hats are built against the 8-aligned
            # window base (win_rows holds the rem<8 slack), so rows outside
            # the tap band get structurally zero hats instead of a rotate
            win = buf[0, :, pl.ds(row0, rwp), pl.ds(s0d, win_w)]
            # lane rolls too: roll(-s) == roll(win_w - s) cyclically, and the
            # non-negative form is the one Mosaic compiles correctly on v5e
            shift = cxp - s0d
            win = pltpu.roll(win, win_w - shift, 2)[:, :, :b_xp]  # [4, rwp, b_x]
            a2 = win.reshape(4 * rwp, b_xp)                 # rows (c, r) c-major
            fx_rel = jnp.where(fx < -1.0, -1e9, fx - cx.astype(f32))
            # compute_dtype=bf16: texture operand + hat VALUES in bf16 with
            # fp32 MXU accumulation (fast mode, ~5e-3 rel; fp32 is the parity
            # mode).  Hats are computed in fp32 first — casting the
            # *coordinates* would shift taps by up to 0.25 texel at band
            # offsets ~64 (bf16 has 8 mantissa bits)
            hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(fx_rel[None] - iota_x))
            if cd != f32:
                hat_x = hat_x.astype(cd)
            # plain 2D matmul (3-D operands are a Mosaic lowering risk);
            # the [4*rwp, 1024] -> [4*rwp, 8, 128] split is layout-free
            if precision == "bf16x3":
                mixed = _dot_bf16x3(
                    a2, hat_x.reshape(b_xp, 8 * LANES),
                    (((1,), (0,)), ((), ())), k_axes=(1, 0))
            else:
                mixed = lax.dot_general(
                    a2, hat_x.reshape(b_xp, 8 * LANES), (((1,), (0,)), ((), ())),
                    precision=precision, preferred_element_type=f32)
            mixed = mixed.reshape(4 * rwp, 8, LANES)
            # mixed [4*rwp, 8, 128]: row c*rwp + r = window row r of channel c.
            # fy_rel is relative to the 8-ALIGNED window base, so taps sit at
            # rows [ry2-base8, +rw) — the contraction covers rw+7 rows and the
            # hats zero out the ones outside the band
            fy_rel = fy - (y0 - PADY_TOP + base8).astype(f32)
            hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(fy_rel[None] - iota_r))
            rw_eff = min(rw + 7, rwp)
            chans = []
            for c in range(4):
                acc = hat_y[0] * mixed[c * rwp]
                for r in range(1, rw_eff):
                    acc = acc + hat_y[r] * mixed[c * rwp + r]
                chans.append(acc)
            parts.append(jnp.stack(chans, axis=0))          # [4, 8, 128]
        samp_full = jnp.concatenate(parts, axis=1)           # [4, R8, 128]
        if warped_ref is not None:
            # strip-major residual layout [V, NS, L, 4, R8, 128]: the whole
            # (strip) out block is contiguous in HBM, so its flush runs at
            # full bandwidth — the plane-major block (L x 4 strided 65 KB
            # runs) flushed at ~64 GB/s and was the fwd's floor (r4)
            warped_ref[0, 0, pl.ds(l, 1)] = samp_full[None]
        alpha = samp_full[3]
        wgt = alpha * acc_t
        fields = [acc_rgb[0] + wgt * samp_full[0],
                  acc_rgb[1] + wgt * samp_full[1],
                  acc_rgb[2] + wgt * samp_full[2],
                  acc_d + wgt * (dsc * q_full)]
        if with_disp:
            fields.append(acc_p + wgt * ((1.0 / dsc) * qinv_full))
        fields.append(acc_t * (1.0 - alpha + eps))
        if grad_carry:
            # composite factor, clamped like composite_bwd's pass1 (guards
            # the bf16x3 alpha = 1+delta interpolation overshoot)
            one_m = jnp.maximum(1.0 - alpha, 0.0) + eps
            fields.append(st_in[idx_t + 1, 0] * one_m)            # S
            fields.append(jnp.minimum(st_in[idx_t + 2, 0], one_m))  # M
        sscr[0, :, pl.ds(si, 1)] = jnp.stack(fields, axis=0)[:, None]

    # NOTE: dead planes' warped-residual slots are left UNWRITTEN (stale
    # VMEM / garbage in HBM).  The r4 kernel zeroed them — ~1 GB of VMEM
    # memsets per grad at 1024^2 and a large share of the fwd floor.  The
    # per-strip live-plane count (n_live, monotone: liveness only ever
    # transitions live->dead along planes) ships to the composite backward,
    # which masks planes >= n_live instead of reading their slots.
    if early_out == "grad":
        # Grad-safe occlusion skipping.  S = T / M (M = min composite factor
        # so far) bounds EVERY gradient path out of plane l, including the
        # u / (1 - a + eps) amplification behind a single opaque plane that
        # makes the plain early-out (threshold on T) corrupt d_alpha — the
        # division can cancel at most the one smallest factor, and that is
        # exactly the factor S removes.  S is monotone non-increasing along
        # planes, so once a strip block is dead it stays dead: compute, the
        # VJP residual, AND the texture-band DMAs of every farther plane are
        # skipped.
        # S: transmittance from CLAMPED factors (max(1-a,0)+eps).  The trans
        # output itself reassociates (1 - a + eps) into (1+eps) - a which is
        # exactly 0 at a=1 — making S = t/m collapse to 0 and wrongly
        # killing the plane right behind a single opaque one (whose residual
        # feeds the occluder's d_alpha at O(1)).  The clamped product can't
        # hit that zero.
        # Group-of-G while_loop: dead planes cost ZERO loop iterations.
        # The r5 measurement that forced this shape: per-plane pl.when
        # machinery costs ~2.9 us/iteration on v5e (an all-dead fwd still
        # took 21 ms of its 28.6 dense time) — so instead of branching per
        # plane, the loop processes G live planes straight-line, re-checks
        # S once per group, and EXITS at the live->dead transition
        # (liveness is monotone).
        G = 4 if L % 4 == 0 else (2 if L % 2 == 0 else 1)
        n_groups = L // G

        def group_cond(carry):
            g, alive = carry
            return (g < n_groups) & alive

        def group_body(carry):
            g, _ = carry
            for j in range(G):
                l = g * G + j
                slot = lax.rem(l, 2)

                @pl.when(l + 1 < L)
                def _():
                    dma(l + 1, lax.rem(l + 1, 2)).start()

                dma(l, slot).wait()
                compute_plane(l, slot)
            sm = sscr[0, idx_t + 1:idx_t + 3, pl.ds(si, 1)]
            alive = jnp.max(sm[0, 0] / sm[1, 0]) >= GRAD_TAU

            @pl.when(jnp.logical_not(alive))
            def _():
                live_s[0] = 0
                # planes through the end of group g are valid/live
                live_s[1] = G * (g + 1)

            return g + 1, alive

        lax.while_loop(group_cond, group_body,
                       (jnp.int32(0), live_s[0] == 1))
        # drain the one prefetched DMA when the strip died INSIDE the loop
        # before the last plane (entry-dead strips started nothing)
        nl = live_s[1]

        @pl.when((live_s[0] == 0) & (nl > 0) & (nl < L))
        def _():
            dma(nl, lax.rem(nl, 2)).wait()

        nl_ref[vi, si] = live_s[1]
    elif early_out:
        G = 4 if L % 4 == 0 else (2 if L % 2 == 0 else 1)
        n_groups = L // G

        def group_cond(carry):
            g, alive = carry
            return (g < n_groups) & alive

        def group_body(carry):
            g, _ = carry
            # dead planes' warped slots are left stale (callers must not
            # consume warped on this path — the VJP uses "grad")
            for j in range(G):
                l = g * G + j
                slot = lax.rem(l, 2)

                @pl.when(l + 1 < L)
                def _():
                    dma(l + 1, lax.rem(l + 1, 2)).start()

                dma(l, slot).wait()
                compute_plane(l, slot)
            t_now = sscr[0, idx_t, pl.ds(si, 1)][0]
            alive = jnp.max(t_now) >= 1e-6

            @pl.when(jnp.logical_not(alive))
            def _():
                live_s[0] = 0
                live_s[1] = G * (g + 1)

            return g + 1, alive

        lax.while_loop(group_cond, group_body,
                       (jnp.int32(0), live_s[0] == 1))
        nl = live_s[1]

        @pl.when((live_s[0] == 0) & (nl > 0) & (nl < L))
        def _():
            dma(nl, lax.rem(nl, 2)).wait()
    else:
        def plane_body(l, carry):
            slot = lax.rem(l, 2)

            @pl.when(l + 1 < L)
            def _():
                dma(l + 1, lax.rem(l + 1, 2)).start()

            dma(l, slot).wait()
            compute_plane(l, slot)
            return 0

        lax.fori_loop(0, L, plane_body, 0)

    @pl.when(si == n_strips - 1)
    def _():
        cp = pltpu.make_async_copy(
            sscr, state_out_any.at[pl.ds(vi, 1)], ssem.at[1])
        cp.start()
        cp.wait()


def warp_composite_fwd(
    tex_pad: jnp.ndarray,   # [V, L, 4, Th+PADY_TOP+PADY_BOT, Wp] zero-padded
    rx: jnp.ndarray,        # [V, NS, R8, 128] subtile-flat (flatten_pixels)
    ry: jnp.ndarray,
    q: jnp.ndarray,
    scal: jnp.ndarray,      # [V, L, 6]
    bands: FusedBands,
    early_out: bool = False,
    eps: float = EPS,
    interpret: bool = False,
    carry=None,             # (color_pre, depth_pre, trans) from nearer slabs
    pad_bot: int = PADY_BOT,
    precision=lax.Precision.HIGHEST,
    compute_dtype=None,     # bf16: half texture DMA + hat vregs, fp32 accum
    with_warped: bool = True,   # False: skip the VJP residual (inference)
    lo: int = 0,            # first plane of this chunk within tex_pad
    with_disp: bool = False,    # expected-disparity partial (mpi.py:431)
    packed_io: bool = False,    # return/accept the packed state array
):
    """Slab partials + warped residual for one plane chunk.

    All pixel-space tensors use the subtile-flat layout of
    :func:`flatten_pixels` ([V, NS, R8, 128] per channel).  With ``carry``
    the slab continues the over-composite of nearer planes (sequential
    chaining — lets ``early_out`` skip occluded far slabs); without it,
    partials start fresh and combine associatively via ``combine_segments``.

    ``tex_pad`` may hold MORE planes than this chunk renders: ``scal``
    defines the chunk (its plane count) and ``lo`` its offset into the
    texture stack — the kernel's strided DMA indexes the slice, so chunked
    callers never materialize ``tex_pad[:, lo:hi]`` (an ~L*17 MB copy per
    chunk boundary at 1024^2 that XLA cannot fuse away).

    Returns (color_pre [V,3,NS,R8,128], depth_pre [V,NS,R8,128],
    trans [V,NS,R8,128], warped [V,L,4,NS,R8,128]).  ``with_disp`` inserts a
    disparity partial after depth (carry tuples gain the same slot:
    ``(c, d, p, t[, s, m])``) and the return becomes
    (color, depth, disp, trans, warped[, s, m]).
    """
    v, l_total = tex_pad.shape[0], tex_pad.shape[1]
    l_planes = scal.shape[1]
    assert lo + l_planes <= l_total, (lo, l_planes, l_total)
    tex_h = tex_pad.shape[3] - PADY_TOP - pad_bot
    tex_w = tex_h  # square textures; width padding beyond Tw+PAD is zeros
    assert bands.by_pad <= pad_bot, (bands, pad_bot)
    n_strips, r8 = rx.shape[1], rx.shape[2]
    assert r8 % 8 == 0 and rx.shape[3] == LANES, rx.shape
    assert bands.b_x > 0, "bands predate the MXU kernel; re-run planning"

    tex_flat = tex_pad.reshape(v * l_total, 4, *tex_pad.shape[3:])
    n_base = 4 if with_disp else 3  # (c, d[, p], t)
    grad_carry = early_out == "grad"
    # packed fields: rgb(3) + d + [p] + t + [s, m]
    idx_t = 4 + (1 if with_disp else 0)
    n_fields = idx_t + 1 + (2 if grad_carry else 0)

    # pack the carry into the single state array [V, F, NS, R8, 128]
    state_in = None
    if carry is not None and not isinstance(carry, (tuple, list)):
        state_in = carry  # already packed (chunk chaining)
        assert state_in.shape[1] == n_fields, (state_in.shape, n_fields)
    elif carry is not None:
        if early_out == "grad" and len(carry) == n_base:
            base = list(carry)
        else:
            base = list(carry[:n_base])
        fields = [base[0]] + [x[:, None] for x in base[1:]]
        if grad_carry:
            if len(carry) == n_base + 2:
                fields += [carry[n_base][:, None], carry[n_base + 1][:, None]]
            else:
                ones = jnp.ones((v, 1, n_strips, r8, LANES), jnp.float32)
                fields += [ones, ones]
        state_in = jnp.concatenate(fields, axis=1)

    kernel = functools.partial(
        _fwd_kernel, L=l_planes, tex_h=tex_h, tex_w=tex_w, pad_bot=pad_bot,
        bands=bands, early_out=early_out, eps=eps, precision=precision,
        compute_dtype=compute_dtype, with_warped=with_warped,
        lo=lo, l_total=l_total, grad_carry=grad_carry, with_disp=with_disp,
        init_state=state_in is None)

    grid = (v, n_strips)
    rays = jnp.stack([rx, ry, q], axis=1)  # [V, 3, NS, R8, 128]
    # scalar window bases precomputed outside (see subtile_base_mins): the
    # in-kernel per-subtile vector-min -> scalar-extract chains (2/subtile
    # + 1 full-strip min per plane DMA) were first-order per-step machinery
    mx, my = subtile_base_mins(scal, rx, ry)
    cx_b, ryb_b = bases_from_mins(mx, my, pair=False)
    y_exact = jnp.floor(jnp.min(my, axis=-1)).astype(jnp.int32) - 1
    y0_b = jnp.clip(y_exact + PADY_TOP, 0,
                    tex_h + PADY_TOP + pad_bot - bands.by_pad)
    y0_b = (y0_b // 8) * 8                     # [V, L, NS] 8-aligned
    state_shape = jax.ShapeDtypeStruct(
        (v, n_fields, n_strips, r8, LANES), jnp.float32)
    out_shape = [state_shape]
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    if with_warped:
        # strip-major [V, NS, L, 4, R8, 128]: contiguous per-strip flush
        out_shape.append(jax.ShapeDtypeStruct(
            (v, n_strips, l_planes, 4, r8, LANES), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, l_planes, 4, r8, LANES),
                                      lambda vi, si: (vi, si, 0, 0, 0, 0)))
    if grad_carry:
        # per-strip live-plane count for the composite backward's masking
        # (full-array resident SMEM block: Mosaic requires SMEM block shapes
        # to equal the array dims; each step writes its own element)
        out_shape.append(jax.ShapeDtypeStruct((v, n_strips), jnp.int32))
        out_specs.append(pl.BlockSpec((v, n_strips), lambda vi, si: (0, 0),
                                      memory_space=pltpu.SMEM))
    n_sub = r8 // 8
    in_specs = [
        pl.BlockSpec((1, l_planes, 6), lambda vi, si: (vi, 0, 0),
                     memory_space=pltpu.SMEM),
        # per-view resident ray fields: ONE block copy per view
        pl.BlockSpec((1, 3, n_strips, r8, LANES),
                     lambda vi, si: (vi, 0, 0, 0, 0)),
        # per-(plane, strip[, subtile]) scalar window bases, resident per
        # view (SMEM block last-two dims must equal the array dims)
        pl.BlockSpec((1, l_planes, n_strips), lambda vi, si: (vi, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, l_planes, n_strips, n_sub),
                     lambda vi, si: (vi, 0, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, l_planes, n_strips, n_sub),
                     lambda vi, si: (vi, 0, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    inputs = [scal, rays, y0_b, cx_b, ryb_b]
    if state_in is not None:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(state_in)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    inputs.append(tex_flat)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[
                pltpu.VMEM((1, n_fields, n_strips, r8, LANES), jnp.float32),
                pltpu.VMEM((1, 4, 2 * bands.by_pad, tex_pad.shape[4]),
                           compute_dtype or jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),   # state in/out
                pltpu.SMEM((2,), jnp.int32),   # [liveness flag, n_live]
            ],
        ),
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(*inputs)
    state_out = outs[0]
    warped = outs[1] if with_warped else None
    n_live = outs[-1] if grad_carry else None
    if packed_io:
        return (state_out, warped, n_live) if grad_carry else (state_out,
                                                               warped)
    base_out = (state_out[:, 0:3],) + tuple(
        state_out[:, 3 + i] for i in range(n_base - 1))
    if grad_carry:
        return base_out + (warped, state_out[:, idx_t + 1],
                           state_out[:, idx_t + 2], n_live)
    return base_out + (warped,)


# ---------------------------------------------------------------------------
# MXU splat adjoint: the exact transpose of the MXU forward kernel.
# ---------------------------------------------------------------------------

OUT_PAD_TOP = 64   # texel-row padding above the texture gradient: pixel
OUT_PAD_BOT = 64   # subtiles splatting (partially) into the zero-pad region
BLK = 64           # output texel rows per grid block (spill-carried)


class SplatPlan(NamedTuple):
    """Static per-chunk config of the splat adjoint."""
    n_ps: int      # pixel strips DMA'd per texel block
    n_blocks: int  # texel-row blocks (= padded rows / BLK)


def _subtile_row_bases(scal, ry):
    """Per-(view, plane, strip, subtile) diagonal texel-row base
    ``floor(min(fy_m - i)) - 1`` — jittable, mirrors the kernels exactly.

    scal [V, L, 6], ry [V, H, W] (row-major) -> int32 [V, L, NS, NT].
    """
    v, h, w = ry.shape
    ns, nt = h // STRIP, w // SUBW
    i_arr = jnp.arange(STRIP, dtype=jnp.float32)[:, None, None]
    ry5 = ry.reshape(v, ns, STRIP, nt, SUBW)

    def one(s, ryv):  # s [6], ryv [ns, STRIP, nt, SUBW]
        fy = s[2] * ryv + s[3]
        fy_m = jnp.where(fy < -1.0, 1e9, fy) - i_arr[None]
        return jnp.floor(jnp.min(fy_m, axis=(1, 3))).astype(jnp.int32) - 1

    return jax.vmap(lambda sv, ryv: jax.vmap(lambda s: one(s, ryv))(sv))(scal, ry5)


def splat_bases(scal, ry, tex_h: int, n_ps: int, n_blocks: int):
    """Per-(view, plane, block) first pixel strip in the block's DMA band
    (scalar-prefetch operand of the splat kernel) — jittable.

    A (strip, subtile) is assigned to the block containing its out-row base
    ``oyb = ryb + OUT_PAD_TOP``; strips entirely above/below the padded
    output are skipped (their taps land only in the sliced-off pad)."""
    v = ry.shape[0]
    ns = ry.shape[1] // STRIP
    rb = _subtile_row_bases(scal, ry)                     # [V, L, NS, NT]
    n_l = rb.shape[1]
    oyb = rb + OUT_PAD_TOP
    valid = (oyb >= 0) & (oyb < n_blocks * BLK)
    blk = jnp.clip(oyb // BLK, 0, n_blocks - 1)
    strip_ids = jnp.arange(ns, dtype=jnp.int32)[None, None, :, None]
    big = jnp.int32(ns + 1000)
    # min strip per block via one-hot masking over the small NB axis
    out = []
    for b in range(n_blocks):
        m = valid & (blk == b)
        s_min = jnp.min(jnp.where(m, strip_ids, big), axis=(2, 3))  # [V, L]
        out.append(jnp.where(s_min > ns, 0, s_min))
    ps = jnp.stack(out, axis=-1)                           # [V, L, NB]
    return jnp.clip(ps, 0, max(ns - n_ps, 0)).astype(jnp.int32)


def plan_splat(scal, ry, plan, tex_h: int) -> list:
    """Host-side splat planning: per forward chunk, the pixel-strip band
    width ``n_ps`` (max strips any block needs) and the block count."""
    import numpy as _np

    rows = OUT_PAD_TOP + tex_h + OUT_PAD_BOT
    assert rows % BLK == 0
    nb = rows // BLK
    rb = _np.asarray(_subtile_row_bases(jnp.asarray(scal), jnp.asarray(ry)))
    v, n_l, ns, nt = rb.shape
    oyb = rb + OUT_PAD_TOP
    valid = (oyb >= 0) & (oyb < nb * BLK)
    blk = _np.clip(oyb // BLK, 0, nb - 1)
    plans = []
    for lo, hi, _bands in plan:
        n_ps = 1
        for vi in range(v):
            for l in range(lo, hi):
                for b in _np.unique(blk[vi, l][valid[vi, l]]):
                    m = valid[vi, l] & (blk[vi, l] == b)
                    s = _np.nonzero(m.any(axis=1))[0]
                    n_ps = max(n_ps, int(s.max() - s.min() + 1))
        # +1 margin: poses inside the truncated range can phase a strip
        # across a block boundary differently from the planning poses
        plans.append(SplatPlan(n_ps=min(n_ps + 1, ns), n_blocks=nb))
    return plans


def splat_plans_ok(scal, ry, plan, splat_plans) -> jnp.ndarray:
    """Jittable validity check of splat plans for a concrete pose batch:
    True iff every (view, plane, texel block)'s contributing pixel strips
    fit the static DMA band ``n_ps`` (the backward analogue of
    :func:`fused_bands_ok` — an undersized band silently drops cotangent)."""
    ry = jnp.asarray(ry, jnp.float32)
    ns = ry.shape[1] // STRIP
    rb = _subtile_row_bases(jnp.asarray(scal), ry)           # [V, L, NS, NT]
    oyb = rb + OUT_PAD_TOP
    strip_ids = jnp.arange(ns, dtype=jnp.int32)[None, None, :, None]
    ok = jnp.bool_(True)
    for (lo, hi, _b), spl in zip(plan, splat_plans):
        spl = SplatPlan(*spl)
        valid = (oyb[:, lo:hi] >= 0) & (oyb[:, lo:hi] < spl.n_blocks * BLK)
        blk = jnp.clip(oyb[:, lo:hi] // BLK, 0, spl.n_blocks - 1)
        for b in range(spl.n_blocks):
            m = valid & (blk == b)
            s_min = jnp.min(jnp.where(m, strip_ids, ns + 1000), axis=(2, 3))
            s_max = jnp.max(jnp.where(m, strip_ids, -1), axis=(2, 3))
            span = jnp.where(s_max >= 0, s_max - s_min + 1, 0)
            ok &= jnp.all(span <= spl.n_ps)
    return ok


def _splat_kernel(ps_ref, scal_ref, rx_ref, ry_ref, g_ref, out_ref,
                  acc, gbuf, rxbuf, rybuf, sems, *,
                  L, tex_h, bands: FusedBands, splat: SplatPlan,
                  wp: int, precision, trim: bool = False, tex_w: int = 0,
                  lo: int = 0, l_total=None):
    """Exact transpose of ``_fwd_kernel``'s warp: per (plane, texel block),
    pixel strips splat ``d_win[(c,r), x] = sum_p hat_y[r,p] g[c,p] hat_x[x,p]``
    (one MXU contraction over the 1024 subtile pixels) into a spill-carried
    texture-row accumulator.  Same hats, same bases, same clamps as the
    forward — with ``precision=HIGHEST`` (fp32, the parity mode) the VJP is
    exact up to fp32 reassociation; the bf16 fast mode pairs DEFAULT with a
    bf16 ``compute_dtype`` forward (Mosaic lowers no HIGH/bf16x3 on TPU).

    ``trim`` emits d_tex UNPADDED (r4 traffic fix): the all-pad bottom block
    is never run (grid dim is ``n_blocks - 1``), the pad-top block (exactly
    one BLK, ``OUT_PAD_TOP == BLK``) maps onto out block 0 and is overwritten
    by the first texture block's consecutive visit, and the PAD left lanes
    are removed by a cyclic lane roll before the write — no post-kernel
    [OUT_PAD_TOP:, PAD:] slice copy (~4 GB at 96 planes x 1024^2)."""
    if l_total is None:
        l_total = L
    d_y, b_xp = bands.d_y, bands.b_x
    n_ps, n_blocks = splat.n_ps, splat.n_blocks
    nb_run = n_blocks - 1 if trim else n_blocks
    rw = STRIP + d_y
    rwp = win_rows(rw)
    acc_r = BLK + rwp + 8
    w_add = 384
    f32 = jnp.float32
    vi = pl.program_id(0)
    li = pl.program_id(1)
    bi = pl.program_id(2)
    r8 = rx_ref.shape[2]
    n_sub = r8 // 8
    ns_total = rx_ref.shape[1]

    sub_i = lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    lane8 = lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    i_blk = (sub_i + 8 * (lane8 // SUBW)).astype(f32)
    iota_x = lax.broadcasted_iota(jnp.int32, (b_xp, 8, LANES), 0).astype(f32)
    iota_r = lax.broadcasted_iota(jnp.int32, (rwp, 8, LANES), 0).astype(f32)

    def dma(step, slot):
        l = step // nb_run
        b = lax.rem(step, nb_run)
        ps = ps_ref[vi, l, b]
        return [
            pltpu.make_async_copy(
                g_ref.at[pl.ds(vi * l_total + lo + l, 1), :, pl.ds(ps, n_ps)],
                gbuf.at[:, :, pl.ds(slot * n_ps, n_ps)],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                rx_ref.at[pl.ds(vi, 1), pl.ds(ps, n_ps)],
                rxbuf.at[:, pl.ds(slot * n_ps, n_ps)],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                ry_ref.at[pl.ds(vi, 1), pl.ds(ps, n_ps)],
                rybuf.at[:, pl.ds(slot * n_ps, n_ps)],
                sems.at[slot, 2]),
        ]

    step0 = li * nb_run + bi
    slot = lax.rem(step0, 2)

    @pl.when(step0 == 0)
    def _():
        for c in dma(step0, slot):
            c.start()

    @pl.when(step0 + 1 < L * nb_run)
    def _():
        for c in dma(step0 + 1, lax.rem(step0 + 1, 2)):
            c.start()

    for c in dma(step0, slot):
        c.wait()

    @pl.when(bi == 0)
    def _():
        acc[:, :, :] = jnp.zeros((4, acc_r, wp), f32)

    ax = scal_ref[0, li, 0]
    bx = scal_ref[0, li, 1]
    ay = scal_ref[0, li, 2]
    by = scal_ref[0, li, 3]
    ps0 = ps_ref[vi, li, bi]

    def strip_body(n, _):
        for st in range(n_sub):
            rx = rxbuf[0, pl.ds(slot * n_ps + n, 1), st * 8:(st + 1) * 8][0]
            ry = rybuf[0, pl.ds(slot * n_ps + n, 1), st * 8:(st + 1) * 8][0]
            fx = ax * rx + bx
            fy = ay * ry + by
            fx_m = jnp.where(fx < -1.0, 1e9, fx)
            fy_m = jnp.where(fy < -1.0, 1e9, fy)
            cx = jnp.floor(jnp.min(fx_m)).astype(jnp.int32) - 1
            cx = jnp.clip(cx, -2, wp - PAD - b_xp)
            ryb = jnp.floor(jnp.min(fy_m - i_blk)).astype(jnp.int32) - 1
            oyb = ryb + OUT_PAD_TOP
            mine = ((oyb >= bi * BLK) & (oyb < (bi + 1) * BLK)
                    & (oyb >= 0) & (oyb < n_blocks * BLK))
            g = gbuf[0, :, pl.ds(slot * n_ps + n, 1),
                     st * 8:(st + 1) * 8, :][:, 0]              # [4, 8, 128]
            # forward early-out leaves occluded planes with all-zero
            # cotangent — skip their hats/matmul/accumulate entirely
            live = jnp.any(g != 0.0)

            @pl.when(mine & live)
            def _():
                fx_rel = jnp.where(fx < -1.0, -1e9, fx - cx.astype(f32))
                hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(fx_rel[None] - iota_x))
                # y-hats relative to the 8-ALIGNED accumulator row base: the
                # produced d_win rows land directly at acc rows
                # [row8, row8+rwp) — no pad/roll pass (see win_rows)
                row_rel = oyb - bi * BLK                    # [0, BLK)
                row8 = (row_rel // 8) * 8
                rem = row_rel - row8
                fy_rel = fy - ryb.astype(f32) + rem.astype(f32)
                hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(fy_rel[None] - iota_r))
                t_parts = [hat_y * g[c][None] for c in range(4)]
                t_all = jnp.concatenate(t_parts, axis=0)       # [4*rwp, 8, 128]
                # plain 2D rhs-transposed matmul (multi-dim contractions are
                # a Mosaic lowering risk): contract the 1024 subtile pixels
                if precision == "bf16x3":
                    # K = 1024 pixels is already tile-aligned: separate dots,
                    # not the K-concat form (see _dot_bf16x3)
                    d_win = _dot_bf16x3(
                        t_all.reshape(4 * rwp, 8 * LANES),
                        hat_x.reshape(b_xp, 8 * LANES),
                        (((1,), (1,)), ((), ())))
                else:
                    d_win = lax.dot_general(
                        t_all.reshape(4 * rwp, 8 * LANES),
                        hat_x.reshape(b_xp, 8 * LANES),
                        (((1,), (1,)), ((), ())),
                        precision=precision,
                        preferred_element_type=f32)             # [4*rwp, b_xp]
                d_win = d_win.reshape(4, rwp, b_xp)
                # rows already aligned (hats built vs row8) — place at
                # (acc row row8, lane cx + PAD) and RMW-add
                cxp = cx + PAD
                lane0 = jnp.clip(((cxp - 64) // 128) * 128, 0, wp - w_add)
                lane0 = pl.multiple_of(lane0, 128)
                lr = cxp - lane0
                # value-level .at[].set lowers to scatter (unsupported in
                # Mosaic) — build the widened block with a concat instead
                wide = jnp.concatenate(
                    [d_win, jnp.zeros((4, rwp, w_add - b_xp), f32)],
                    axis=2)
                wide = pltpu.roll(wide, lr, 2)
                cur = acc[:, pl.ds(row8, rwp), pl.ds(lane0, w_add)]
                acc[:, pl.ds(row8, rwp), pl.ds(lane0, w_add)] = cur + wide
        return 0

    lax.fori_loop(0, n_ps, strip_body, 0)

    if trim:
        # drop the PAD left lanes with a cyclic roll (arbitrary-offset lane
        # slices don't lower; the wrapped tail lands beyond tex_w, sliced
        # statically) — the pad-top block's write is overwritten by the
        # first texture block's consecutive visit to the same out index
        rolled = pltpu.roll(acc[:, :BLK, :], wp - PAD, 2)
        out_ref[0, 0] = rolled[:, :, :tex_w]
    else:
        out_ref[0, 0] = acc[:, :BLK, :]
    # spill-carry: rows beyond this block belong to the next one
    tail = acc[:, BLK:acc_r, :]
    acc[:, :acc_r - BLK, :] = tail
    acc[:, acc_r - BLK:acc_r, :] = jnp.zeros((4, BLK, wp), f32)


def _splat_plane_kernel(flags_ref, *rest,
                        L, tex_h, tex_w, bands: FusedBands, wp: int,
                        rows_pad: int, precision, lo: int, l_total: int,
                        has_nl: bool = False, has_bases: bool = False,
                        pad_l: int = PAD, exact_out: bool = False,
                        n_out: int | None = None, out_lo: int = 0,
                        has_alias: bool = False):
    """Fat-step splat (r4 redesign): one PLANE per grid step.

    The block-partitioned splat (``_splat_kernel``) measured DMA/fixed-cost
    bound on v5e: 1710 grid steps x ~38 us regardless of compute (its
    rx/ry/g strip bands re-DMA ~2x per block visit, 3.1 GB of redundant
    reads), and liveness skipping saved nothing.  Here the full-texture
    accumulator lives in VMEM (no blocks, no spill-carry, no splat_bases),
    rx/ry stay RESIDENT per view as Pallas blocks, the plane's cotangent
    streams in per-strip (read exactly once), and the finished plane
    gradient leaves via ONE manual async copy per step, double-buffered
    across accumulators so the flush overlaps the next plane's compute.
    Same hats, bases, clamps, and matmul as ``_splat_kernel`` — the exact
    transpose of the forward warp.

    ``has_nl``: per-(plane, strip) liveness comes from the fwd's n_live
    counts as a SCALAR compare instead of ``jnp.any(g != 0)`` — the vector
    reduce + scalar extract per subtile pair measured ~us-scale on v5e and
    dominated live planes' overhead.
    """
    rest = list(rest)
    nl_ref = rest.pop(0) if has_nl else None
    scal_ref, rx_ref, ry_ref = rest[:3]
    rest = rest[3:]
    cx_ref = ryb_ref = None
    if has_bases:
        cx_ref, ryb_ref = rest[:2]
        rest = rest[2:]
    if has_alias:
        rest.pop(0)   # aliased output buffer rides in as an unread input
    (g_ref, out_ref, acc, gbuf, gsem, osem) = rest
    if n_out is None:
        n_out = L
    d_y = bands.d_y
    rw = STRIP + d_y
    rwp = win_rows(rw)
    # accumulate-window lanes: 384 covers any 128-aligned rebase of a b_x-wide
    # span; small textures (wp < 384, e.g. 64^2 toy MPIs) clamp to the whole
    # padded width — the 384 constant overran their accumulator
    w_add = min(384, wp)
    f32 = jnp.float32
    vi = pl.program_id(0)
    li = pl.program_id(1)
    n_views = pl.num_programs(0)
    step = vi * L + li
    total = n_views * L
    slot = lax.rem(step, 2)
    ns_total = rx_ref.shape[1]
    r8 = rx_ref.shape[2]
    n_sub = r8 // 8

    # paired 16x128 subtiles when the chunk's wider window fits one MXU
    # tile: halves the subtile iterations AND brings the matmul's padded-N
    # utilization from b_x/128 to ~100% (two 64-col subtiles share window)
    pair = bands.b_x2 > 0 and n_sub % 2 == 0
    subr = 16 if pair else 8
    b_xe = bands.b_x2 if pair else bands.b_x
    n_it = n_sub // 2 if pair else n_sub

    sub_i = lax.broadcasted_iota(jnp.int32, (subr, LANES), 0)
    lane8 = lax.broadcasted_iota(jnp.int32, (subr, LANES), 1)
    i_blk = (lax.rem(sub_i, 8) + 8 * (lane8 // SUBW)).astype(f32)
    iota_x = lax.broadcasted_iota(jnp.int32, (b_xe, subr, LANES), 0).astype(f32)
    iota_r = lax.broadcasted_iota(jnp.int32, (rwp, subr, LANES), 0).astype(f32)

    # stream the cotangent in GC-strip groups: per-DMA issue overhead
    # (~7 us on v5e for strided multi-run descriptors) dominated the
    # per-strip version (6144 issues ~= 43 ms); grouping cuts issues GC-fold,
    # and the strip-major layout makes each strip's slice one contiguous
    # 262 KB run
    gc = _gc_strips(ns_total)
    n_grp = ns_total // gc

    def dma_g(gi, gslot):
        return pltpu.make_async_copy(
            g_ref.at[pl.ds(vi, 1), pl.ds(gi * gc, gc),
                     pl.ds((lo + li) * 4, 4)],
            gbuf.at[pl.ds(gslot, 1)],
            gsem.at[gslot])

    def flush(s, oslot):
        vi_s = s // L
        li_s = lax.rem(s, L)
        dst = out_ref.at[pl.ds(vi_s * n_out + out_lo + li_s, 1)]
        if exact_out:
            # lane-aligned depad straight out of the flush DMA (pad_l is a
            # multiple of 128): the gradient leaves exactly [4, Th, Tw] —
            # no XLA depad slice over the whole stack afterwards
            src = acc.at[pl.ds(oslot, 1), :, pl.ds(OUT_PAD_TOP, tex_h),
                         pl.ds(pad_l, tex_w)]
        else:
            src = acc.at[pl.ds(oslot, 1), :, pl.ds(OUT_PAD_TOP, tex_h), :]
        return pltpu.make_async_copy(src, dst, osem.at[oslot])

    # per-plane liveness (composite_bwd's grad-tau bitmap): a dead plane's
    # cotangent is exact zeros — skip its whole DMA stream + strip loop and
    # just flush the zeroed accumulator
    plane_live = flags_ref[vi, lo + li] != 0

    @pl.when(plane_live)
    def _():
        dma_g(0, 0).start()

    # the flush started from acc[slot] two steps ago must land before the
    # accumulator is reset for this plane
    @pl.when(step >= 2)
    def _():
        flush(step - 2, slot).wait()

    acc[pl.ds(slot, 1)] = jnp.zeros((1, 4, rows_pad, wp), f32)

    ax = scal_ref[0, li, 0]
    bx = scal_ref[0, li, 1]
    ay = scal_ref[0, li, 2]
    by = scal_ref[0, li, 3]

    def group_body(gi, _):
        gslot = lax.rem(gi, 2)

        @pl.when(gi + 1 < n_grp)
        def _():
            dma_g(gi + 1, lax.rem(gi + 1, 2)).start()

        dma_g(gi, gslot).wait()

        def strip_in_group(k, _k):
            n = gi * gc + k
            # per-(plane, strip) liveness from the fwd's n_live counts: a
            # scalar SMEM compare (the any(g != 0) vector reduce + scalar
            # extract it replaces measured ~us-scale per subtile pair)
            def subtiles():
                for st in range(n_it):
                    one_subtile(st)

            def one_subtile(st):
                rx = rx_ref[0, pl.ds(n, 1), st * subr:(st + 1) * subr][0]
                ry = ry_ref[0, pl.ds(n, 1), st * subr:(st + 1) * subr][0]
                fx = ax * rx + bx
                fy = ay * ry + by
                if has_bases:
                    # precomputed outside (subtile_base_mins): removes the
                    # two vector-min -> scalar-extract chains per subtile
                    cx = jnp.clip(cx_ref[0, 0, n, st], -2, wp - pad_l - b_xe)
                    ryb = ryb_ref[0, 0, n, st]
                else:
                    fx_m = jnp.where(fx < -1.0, 1e9, fx)
                    fy_m = jnp.where(fy < -1.0, 1e9, fy)
                    cx = jnp.floor(jnp.min(fx_m)).astype(jnp.int32) - 1
                    cx = jnp.clip(cx, -2, wp - pad_l - b_xe)
                    ryb = jnp.floor(
                        jnp.min(fy_m - i_blk)).astype(jnp.int32) - 1
                oyb = ryb + OUT_PAD_TOP
                # absolute-row validity replaces the block-ownership test: a
                # strip whose window is entirely in the sliced-off pad (or
                # whose rays all miss, oyb degenerate) contributes nothing
                valid = (oyb >= 0) & (oyb < OUT_PAD_TOP + tex_h)
                g = gbuf[pl.ds(gslot, 1), pl.ds(k, 1), :,
                         st * subr:(st + 1) * subr, :][0, 0]
                if has_nl:
                    live = jnp.bool_(True)  # gated at strip level below
                else:
                    # grad-sparse cotangents are exact zeros for occluded
                    # planes — skip their hats/matmul/accumulate entirely
                    live = jnp.any(g != 0.0)

                @pl.when(valid & live)
                def _():
                    fx_rel = jnp.where(fx < -1.0, -1e9, fx - cx.astype(f32))
                    if _SPLAT_ABLATE == "no_hatx":
                        hat_x = jnp.zeros((b_xe, subr, LANES), f32) + 0.5
                    else:
                        hat_x = jnp.maximum(
                            0.0, 1.0 - jnp.abs(fx_rel[None] - iota_x))
                    row8 = (oyb // 8) * 8   # 8-aligned absolute acc row
                    rem = oyb - row8
                    fy_rel = fy - ryb.astype(f32) + rem.astype(f32)
                    if _SPLAT_ABLATE == "no_haty":
                        t_all = jnp.zeros((4 * rwp, subr, LANES), f32) + 0.5
                    else:
                        hat_y = jnp.maximum(
                            0.0, 1.0 - jnp.abs(fy_rel[None] - iota_r))
                        t_parts = [hat_y * g[c][None] for c in range(4)]
                        t_all = jnp.concatenate(t_parts, axis=0)
                    if _SPLAT_ABLATE == "no_dot":
                        # kills the dot + operand reshapes (hat_x may DCE)
                        d_win = t_all[:, 0, :b_xe]
                    elif (precision == "bf16x3"
                          and _SPLAT_ABLATE != "dot_f32"):
                        d_win = _dot_bf16x3(
                            t_all.reshape(4 * rwp, subr * LANES),
                            hat_x.reshape(b_xe, subr * LANES),
                            (((1,), (1,)), ((), ())))
                    else:
                        prec = (lax.Precision.HIGHEST
                                if precision == "bf16x3" else precision)
                        d_win = lax.dot_general(
                            t_all.reshape(4 * rwp, subr * LANES),
                            hat_x.reshape(b_xe, subr * LANES),
                            (((1,), (1,)), ((), ())),
                            precision=prec,
                            preferred_element_type=f32)       # [4*rwp, b_xe]
                    d_win = d_win.reshape(4, rwp, b_xe)
                    cxp = cx + pad_l
                    lane0 = jnp.clip(((cxp - 64) // 128) * 128, 0, wp - w_add)
                    lane0 = pl.multiple_of(lane0, 128)
                    lr = cxp - lane0
                    wide = jnp.concatenate(
                        [d_win, jnp.zeros((4, rwp, w_add - b_xe), f32)],
                        axis=2)
                    if _SPLAT_ABLATE != "no_roll":
                        wide = pltpu.roll(wide, lr, 2)
                    if _SPLAT_ABLATE == "no_acc":
                        acc[pl.ds(slot, 1), :, pl.ds(row8, rwp),
                            pl.ds(lane0, w_add)] = wide[None]
                    else:
                        cur = acc[pl.ds(slot, 1), :, pl.ds(row8, rwp),
                                  pl.ds(lane0, w_add)]
                        acc[pl.ds(slot, 1), :, pl.ds(row8, rwp),
                            pl.ds(lane0, w_add)] = cur + wide[None]

            if has_nl:
                # one scalar branch skips the strip's whole subtile loop
                # (per-(plane, strip) liveness from the fwd's n_live)
                @pl.when((lo + li) < nl_ref[vi, n])
                def _():
                    subtiles()
            else:
                subtiles()
            return 0

        lax.fori_loop(0, gc, strip_in_group, 0)
        return 0

    @pl.when(plane_live)
    def _():
        lax.fori_loop(0, n_grp, group_body, 0)

    flush(step, slot).start()
    # drain: the final step waits its own flush plus the previous one
    @pl.when(step == total - 1)
    def _():
        flush(step, slot).wait()
    if total >= 2:
        @pl.when(step == total - 1)
        def _():
            flush(step - 1, 1 - slot).wait()


def warp_splat_fat(
    d_samp_flat: jnp.ndarray,   # [V, NS, L_total, 4, R8, 128] strip-major
    rx_flat: jnp.ndarray,       # [V, NS, R8, 128]
    ry_flat: jnp.ndarray,
    scal: jnp.ndarray,          # [V, L_chunk, 6]
    bands: FusedBands,
    tex_h: int,
    tex_w: int,
    interpret: bool = False,
    precision=lax.Precision.HIGHEST,
    lo: int = 0,
    live_flags=None,            # [V, L_total] (>0 live); None = all live
    n_live=None,                # [V, NS] per-strip live counts (fwd n_live)
    out_buf=None,               # [V, L_total, 4, Th, Tw]: write this chunk's
                                # planes in place (input_output_alias chain)
    full_out: bool = False,     # full-stack out even without out_buf (the
                                # chain's first link; other planes garbage
                                # until their chunks write them)
):
    """Fat-step warp transpose -> d_tex [V, L, 4, tex_h, tex_w].

    See :func:`_splat_plane_kernel`.  Requires the full-texture accumulator
    pair + resident rx/ry to fit VMEM (callers gate on
    :func:`splat_fat_fits`); no splat plan needed.

    For lane-aligned textures the accumulator carries a 128-lane left pad so
    the per-plane flush DMA emits the EXACT unpadded gradient — no XLA depad
    slice over the stack.  With ``out_buf`` the call writes its chunk's
    planes into the given full-stack buffer in place (``input_output_aliases``)
    and returns the full stack: chunked callers chain these instead of
    concatenating per-chunk outputs (a ~2x stack copy at 96x1024^2).
    """
    v, l_total = d_samp_flat.shape[0], d_samp_flat.shape[2]
    l_planes = scal.shape[1]
    assert lo + l_planes <= l_total, (lo, l_planes, l_total)
    n_strips, r8 = rx_flat.shape[1], rx_flat.shape[2]
    exact_out = tex_w % LANES == 0
    if exact_out:
        pad_l = 128
        wp = pad_l + tex_w + 128
    else:
        pad_l = PAD
        wp = ((tex_w + 2 * PAD + 127) // 128) * 128
        if wp < 512:
            wp = 1 << (wp - 1).bit_length()
    assert (out_buf is None and not full_out) or exact_out, (
        "alias chain needs exact-out shapes")
    full_out = full_out or out_buf is not None
    n_out = l_total if full_out else l_planes
    out_lo = lo if full_out else 0
    rows_pad = OUT_PAD_TOP + tex_h + OUT_PAD_BOT
    # y-window bound: the accumulate slices acc[:, row8:row8+rwp] with row8
    # up to OUT_PAD_TOP+tex_h-8, so rwp must fit the bottom pad — otherwise
    # a steep pose spread silently corrupts the other double-buffered slot
    # (the block kernel spill-carries arbitrary rwp; use it instead)
    assert win_rows(STRIP + bands.d_y) <= OUT_PAD_BOT + 8, (
        f"fat splat y-window {win_rows(STRIP + bands.d_y)} rows exceeds "
        f"OUT_PAD_BOT+8={OUT_PAD_BOT + 8}; use the block-partitioned kernel "
        f"for d_y={bands.d_y}")

    if live_flags is None:
        flags = jnp.ones((v, l_total), jnp.int32)
    else:
        flags = (live_flags > 0).astype(jnp.int32)
    # merge (L, 4) so one pl.ds selects a plane's 4 channels: per-strip
    # slices are then contiguous 262 KB runs
    g_flat = d_samp_flat.reshape(v, n_strips, l_total * 4, r8, LANES)
    has_nl = n_live is not None
    n_pref = 2 if has_nl else 1
    # window bases precomputed outside the kernel (see subtile_base_mins)
    n_sub = r8 // 8
    pair = bands.b_x2 > 0 and n_sub % 2 == 0
    n_it = n_sub // 2 if pair else n_sub
    mx, my = subtile_base_mins(scal, rx_flat, ry_flat)
    cx_b, ryb_b = bases_from_mins(mx, my, pair)
    kernel = functools.partial(
        _splat_plane_kernel, L=l_planes, tex_h=tex_h, tex_w=tex_w,
        bands=bands, wp=wp, rows_pad=rows_pad, precision=precision,
        lo=lo, l_total=l_total, has_nl=has_nl, has_bases=True,
        pad_l=pad_l, exact_out=exact_out, n_out=n_out, out_lo=out_lo,
        has_alias=out_buf is not None)
    pref = ([flags, n_live.astype(jnp.int32)] if has_nl else [flags])
    in_specs = [
        pl.BlockSpec((1, l_planes, 6),
                     lambda vi, li, *s: (vi, 0, 0),
                     memory_space=pltpu.SMEM),
        # rx/ry resident per view (index constant in li)
        pl.BlockSpec((1, n_strips, r8, LANES),
                     lambda vi, li, *s: (vi, 0, 0, 0)),
        pl.BlockSpec((1, n_strips, r8, LANES),
                     lambda vi, li, *s: (vi, 0, 0, 0)),
        pl.BlockSpec((1, 1, n_strips, n_it),
                     lambda vi, li, *s: (vi, li, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, n_strips, n_it),
                     lambda vi, li, *s: (vi, li, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    inputs = [scal, rx_flat, ry_flat, cx_b, ryb_b]
    io_alias = {}
    has_alias = out_buf is not None
    if has_alias:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        inputs.append(out_buf.reshape(v * l_total, 4, tex_h, tex_w))
        # alias index counts the scalar-prefetch operands first
        io_alias = {n_pref + len(inputs) - 1: 0}
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))   # g_flat
    inputs.append(g_flat)
    out_w = tex_w if exact_out else wp
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_pref,
            grid=(v, l_planes),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 4, rows_pad, wp), jnp.float32),
                pltpu.VMEM((2, _gc_strips(n_strips), 4, r8, LANES),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (v * n_out, 4, tex_h, out_w), jnp.float32),
        interpret=interpret,
        input_output_aliases=io_alias,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*pref, *inputs)
    out = out.reshape(v, n_out, 4, tex_h, out_w)
    if exact_out:
        return out
    return out[:, :, :, :, PAD:PAD + tex_w]


def splat_fat_fits(tex_h: int, tex_w: int, n_strips: int, r8: int) -> bool:
    """True when the fat-step splat's VMEM working set fits the budget."""
    if tex_w % LANES == 0:
        wp = 128 + tex_w + 128        # exact-out geometry (128-lane pads)
    else:
        wp = ((tex_w + 2 * PAD + 127) // 128) * 128
        if wp < 512:
            wp = 1 << (wp - 1).bit_length()
    rows_pad = OUT_PAD_TOP + tex_h + OUT_PAD_BOT
    acc = 2 * 4 * rows_pad * wp * 4
    resident = 2 * 2 * n_strips * r8 * LANES * 4   # rx+ry, double-buffered
    return acc + resident + (4 << 20) < 88 * 1024 * 1024


def warp_splat(
    d_samp_flat: jnp.ndarray,   # [V, NS, L, 4, R8, 128] strip-major cotangent
    rx_flat: jnp.ndarray,       # [V, NS, R8, 128]
    ry_flat: jnp.ndarray,
    ry_rowmajor: jnp.ndarray,   # [V, H, W] (for the jittable base computation)
    scal: jnp.ndarray,          # [V, L, 6]
    bands: FusedBands,
    splat: SplatPlan,
    tex_h: int,
    tex_w: int,
    interpret: bool = False,
    precision=lax.Precision.HIGHEST,
    lo: int = 0,
    live_flags=None,
    n_live=None,
    out_buf=None,
    full_out: bool = False,
):
    """Exact warp transpose -> d_tex [V, L, 4, tex_h, tex_w] (MXU splat).

    ``d_samp_flat`` may hold MORE planes than this chunk splats: ``scal``
    defines the chunk and ``lo`` its offset — the kernel DMA indexes the
    slice (no ``d_samp[:, lo:hi]`` materialization at chunk boundaries).

    Auto-selects the fat-step per-plane kernel (:func:`warp_splat_fat`)
    when its VMEM working set fits — measured ~2x the block-partitioned
    kernel on v5e; the block kernel remains the fallback for shapes whose
    full-texture accumulator cannot live in VMEM.  ``live_flags``
    ([V, L_total], >0 live) lets the fat kernel skip dead planes' DMA
    streams; the block kernel ignores it (its per-subtile zero check
    already skips their compute).
    """
    if _SPLAT_BACKEND != "classic":
        ns_, r8_ = rx_flat.shape[1], rx_flat.shape[2]
        if (_SPLAT_BACKEND == "fat"
                or (splat_fat_fits(tex_h, tex_w, ns_, r8_)
                    and win_rows(STRIP + bands.d_y) <= OUT_PAD_BOT + 8)):
            return warp_splat_fat(
                d_samp_flat, rx_flat, ry_flat, scal, bands, tex_h, tex_w,
                interpret=interpret, precision=precision, lo=lo,
                live_flags=live_flags, n_live=n_live, out_buf=out_buf,
                full_out=full_out)
    assert out_buf is None and not full_out, (
        "alias-chained splat requires the fat kernel")
    # the block-partitioned fallback operates plane-major: transpose once
    # (fallback shapes are small; the production fat path never pays this)
    d_pm = jnp.transpose(d_samp_flat, (0, 2, 3, 1, 4, 5))
    v, l_total = d_pm.shape[0], d_pm.shape[1]
    l_planes = scal.shape[1]
    assert lo + l_planes <= l_total, (lo, l_planes, l_total)
    n_strips, r8 = rx_flat.shape[1], rx_flat.shape[2]
    wp = ((tex_w + 2 * PAD + 127) // 128) * 128
    if wp < 512:
        wp = 1 << (wp - 1).bit_length()
    rw = STRIP + bands.d_y
    rwp = win_rows(rw)

    g_flat = d_pm.reshape(v * l_total, 4, n_strips, r8, LANES)
    bases = splat_bases(scal, ry_rowmajor, tex_h, splat.n_ps, splat.n_blocks)

    # trim: emit d_tex unpadded straight from the kernel (see _splat_kernel).
    # Needs lane-aligned widths, BLK-aligned rows, and the structural
    # OUT_PAD_TOP == BLK identity (pad-top folds into exactly one block).
    trim = (tex_w % LANES == 0 and tex_h % BLK == 0
            and OUT_PAD_TOP == BLK and tex_w + PAD <= wp)
    if _FORCE_TRIM is not None:   # perf-probe hook (tools/probe_splat_ab.py)
        trim = trim and _FORCE_TRIM
    kernel = functools.partial(
        _splat_kernel, L=l_planes, tex_h=tex_h, bands=bands, splat=splat,
        wp=wp, precision=precision, trim=trim, tex_w=tex_w,
        lo=lo, l_total=l_total)
    if trim:
        nb_run = splat.n_blocks - 1
        out_spec = pl.BlockSpec(
            (1, 1, 4, BLK, tex_w),
            lambda vi, li, bi, sref: (vi, li, 0, jnp.maximum(bi - 1, 0), 0))
        out_shape = jax.ShapeDtypeStruct(
            (v, l_planes, 4, tex_h, tex_w), jnp.float32)
    else:
        nb_run = splat.n_blocks
        out_spec = pl.BlockSpec(
            (1, 1, 4, BLK, wp),
            lambda vi, li, bi, sref: (vi, li, 0, bi, 0))
        out_shape = jax.ShapeDtypeStruct(
            (v, l_planes, 4, splat.n_blocks * BLK, wp), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(v, l_planes, nb_run),
            in_specs=[
                pl.BlockSpec((1, l_planes, 6),
                             lambda vi, li, bi, sref: (vi, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),   # rx_flat
                pl.BlockSpec(memory_space=pl.ANY),   # ry_flat
                pl.BlockSpec(memory_space=pl.ANY),   # g_flat
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((4, BLK + rwp + 8, wp), jnp.float32),
                pltpu.VMEM((1, 4, 2 * splat.n_ps, r8, LANES), jnp.float32),
                pltpu.VMEM((1, 2 * splat.n_ps, r8, LANES), jnp.float32),
                pltpu.VMEM((1, 2 * splat.n_ps, r8, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        ),
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(bases, scal, rx_flat, ry_flat, g_flat)
    if trim:
        return out
    return out[:, :, :, OUT_PAD_TOP:OUT_PAD_TOP + tex_h, PAD:PAD + tex_w]


class AdjointBands(NamedTuple):
    """Static band config of the adjoint (texture-space) kernel."""
    d_u: int       # pixel-row tap offsets per texel row
    d_v: int       # pixel-lane tap offsets per texel lane
    bi_pad: int    # DMA'd pixel rows per texture strip (multiple of 8)


PADU = 24   # vertical pixel-field padding for the adjoint: keeps the
            # diagonal row base non-negative at the image top.  Pad rows
            # carry ry = -/+1e9 so their fy is far outside every texel's
            # hat support (self-masking), mirroring zero-pad semantics.


def _pad_pixel_rows(rx, ry, g=None, pad_bot: int = PADU):
    """Pad [V, H, W] ray fields (and optionally [N, 4, H, W] cotangents)
    by PADU rows on top and ``pad_bot`` below; ry/rx pads are -1e9 above and
    +1e9 below so fy/fx stay row-monotone and outside all hat supports.
    Passing ``pad_bot=bi_pad`` guarantees the adjoint's row-band DMA never
    clamps at the image bottom (the clamp otherwise forces the band to grow
    unboundedly — see ``_adjoint_bands_from_spans``)."""
    def pad_field(f):
        top = jnp.full_like(f[:, :PADU], -1e9)
        bot = jnp.full_like(f[:, :1], 1e9)
        bot = jnp.broadcast_to(bot, (f.shape[0], pad_bot, f.shape[2]))
        return jnp.concatenate([top, f, bot], axis=1)

    rxp = pad_field(rx)
    ryp = pad_field(ry)
    if g is None:
        return rxp, ryp
    gp = jnp.pad(g, ((0, 0), (0, 0), (PADU, pad_bot), (0, 0)))
    return rxp, ryp, gp


def _adjoint_spans(scal, rx, ry, tex_h, tex_w, margin: int = 2):
    """Per-plane diagonal spans of the *inverse* warp (host helper).

    Mirrors the adjoint kernel's base definitions: for texture strip t the
    pixel-row band starts at ``base_t = min_r(imin(t*16+r) - r) - 1`` and the
    tap loops cover ``du in [0, D_U)``, ``dv in [0, D_V)``.  Returns arrays
    ``(d_u [L], d_v [L], bi [L])`` (bi = rows the strip DMA must cover).
    """
    scal = np.asarray(scal)
    rx = np.asarray(rx)
    ry = np.asarray(ry)
    if scal.ndim == 2:
        scal = scal[None]
    # mirror the kernel's vertical pixel-field padding (see _pad_pixel_rows)
    def pad_np(f):
        top = np.full_like(f[:, :PADU], -1e9)
        bot = np.full_like(f[:, :PADU], 1e9)
        return np.concatenate([top, f, bot], axis=1)

    rx = pad_np(rx)
    ry = pad_np(ry)
    v, h, w = rx.shape
    n_l = scal.shape[1]
    n_strips = tex_h // STRIP
    n_tiles_t = (tex_w + LANES - 1) // LANES
    r_off = np.arange(STRIP)
    us = np.arange(n_strips * STRIP, dtype=np.float64)
    j_full = np.arange(w, dtype=np.float64)[None, :]
    d_v = np.zeros(n_l, dtype=int)
    # per-plane lists of (base_t, hi_t) over valid strips, for the chunk-level
    # clip-aware d_u fixpoint in _adjoint_bands_from_spans
    row_spans = [[] for _ in range(n_l)]

    for vi in range(v):
        for l in range(n_l):
            s = scal[vi, l]
            fy_rmin = s[2] * ry[vi].min(axis=1) + s[3]
            fy_rmax = s[2] * ry[vi].max(axis=1) + s[3]
            assert np.all(np.diff(fy_rmax) >= -1e-6) and np.all(
                np.diff(fy_rmin) >= -1e-6), "fy must be row-monotone"
            imin_u = np.searchsorted(fy_rmax, us - 1.0, side="right")
            imax_u = np.searchsorted(fy_rmin, us + 1.0, side="left") - 1
            imin_t = (imin_u.reshape(n_strips, STRIP) - r_off)
            imax_t = (imax_u.reshape(n_strips, STRIP) - r_off)
            # strips with no contributing rows have imax < imin everywhere
            valid = (imax_t >= imin_t).any(axis=1)
            if valid.any():
                base_t = imin_t.min(axis=1) - 1
                hi_t = imax_t.max(axis=1)
                row_spans[l].append((base_t[valid], hi_t[valid]))

            fx = s[0] * rx[vi] + s[1]
            for tc in range(n_tiles_t):
                lo = tc * LANES - 1.0
                hi = tc * LANES + LANES + 1.0
                mask = (fx >= lo) & (fx < hi)
                if not mask.any():
                    continue
                diff = np.where(mask, j_full - fx, np.nan)
                span = np.nanmax(diff) - np.nanmin(diff)
                d_v[l] = max(d_v[l], int(np.ceil(span)) + 4 + margin)
    return row_spans, d_v, h


def _adjoint_bands_from_spans(row_spans, d_v, h, margin: int = 2
                              ) -> AdjointBands:
    """Band sizes from measured spans.  The caller pads the pixel field
    bottom by ``bi_pad`` rows (``_pad_pixel_rows(pad_bot=bi_pad)``) so the
    strip DMA never clamps; d_u is then just the worst per-strip span."""
    dv = int(max(d_v))
    need = STRIP
    for base_t, hi_t in (sp for plane in row_spans for sp in plane):
        need = max(need, int((hi_t - base_t).max()) + 1 + margin)
    d_u = need
    bi_pad = ((d_u + STRIP + 8 + 7) // 8) * 8
    return AdjointBands(d_u=d_u, d_v=dv, bi_pad=bi_pad)


def plan_adjoint(scal, rx, ry, plan, tex_h, tex_w, margin: int = 2):
    """Adjoint bands for each chunk of a forward plan (host helper)."""
    row_spans, d_v, h = _adjoint_spans(scal, rx, ry, tex_h, tex_w, margin)
    return [
        _adjoint_bands_from_spans(row_spans[lo:hi], d_v[lo:hi], h, margin)
        for lo, hi, _ in plan
    ]


def adjoint_bases(scal, ry, tex_h, bi_pad):
    """Pixel-row band starts for the adjoint kernel (device-side, jittable).

    For texture strip t of plane l, the first contributing pixel row is
    ``imin(u) = #{i : max_j fy(i, j) <= u - 1}`` (fy is row-monotone), and the
    diagonal base is ``min_r(imin(t*16+r) - r) - 1``, mirroring
    ``_adjoint_spans``.  scal [V, L, 6], ry [V, H, W] ->
    int32 [V, L, T] clipped to [0, H - bi_pad].
    """
    h = ry.shape[1]
    n_strips = tex_h // STRIP
    ry_rmax = jnp.max(ry, axis=2)  # [V, H]
    ay = scal[..., 2]
    by = scal[..., 3]
    fy_rmax = ay[..., None] * ry_rmax[:, None, :] + by[..., None]  # [V, L, H]
    us = jnp.arange(n_strips * STRIP, dtype=jnp.float32) - 1.0

    def one(row):
        return jnp.searchsorted(row, us, side="right")

    imin_u = jax.vmap(jax.vmap(one))(fy_rmax)  # [V, L, T*16]
    v, n_l = imin_u.shape[0], imin_u.shape[1]
    imin_t = imin_u.reshape(v, n_l, n_strips, STRIP) - jnp.arange(STRIP)
    base = jnp.min(imin_t, axis=3) - 1
    return jnp.clip(base, 0, max(h - bi_pad, 0)).astype(jnp.int32)


def _adj_kernel(base_ref, scal_ref, rx_ref, ry_ref, g_ref, out_ref,
                gbuf, rxbuf, rybuf, sems, *,
                bands: AdjointBands, tex_w: int):
    """Texture-space adjoint of the warp: ``d_tex[u,v] = sum_px hats * g``.

    Grid (view, plane, texture strip).  For each texture strip, one DMA pulls
    the pixel-row band of the warped-sample cotangent ``g`` (and of rx/ry to
    rebuild fx/fy); per 128-lane texel tile, contributions accumulate over
    static ``(du, dv)`` pixel offsets after a diagonal lane rebase — the exact
    transpose of the forward kernel's tap sums (same hat values, so the VJP is
    exact in fp32 up to reassociation).
    """
    d_u, d_v, bi_pad = bands.d_u, bands.d_v, bands.bi_pad
    bi_use = bi_pad - 8
    vi = pl.program_id(0)
    li = pl.program_id(1)
    ti = pl.program_id(2)
    n_l = pl.num_programs(1)
    n_strips = pl.num_programs(2)
    w_img = rx_ref.shape[2]
    win_src = min(512, w_img)
    # power-of-two window width: rolled by 32 lanes per dv step.  The dv
    # sweep must not wrap pixels back around: 32*ceil(d_v/32) + LANES <= win_v
    win_v = 256 if 32 * ((d_v + 31) // 32) + LANES <= 256 else 512
    assert 32 * ((d_v + 31) // 32) + LANES <= win_v, d_v
    assert win_src >= win_v, (win_src, win_v)
    n_tiles = tex_w // LANES
    f32 = jnp.float32

    ax = scal_ref[0, li, 0]
    bx = scal_ref[0, li, 1]
    ay = scal_ref[0, li, 2]
    by = scal_ref[0, li, 3]

    def dma(step, slot):
        # step indexes (plane, strip) pairs in grid order
        l = step // n_strips
        t = lax.rem(step, n_strips)
        b = base_ref[vi, l, t]
        a0 = pl.multiple_of((b // 8) * 8, 8)
        copies = [
            pltpu.make_async_copy(
                g_ref.at[pl.ds(vi * n_l + l, 1), :, pl.ds(a0, bi_pad), :],
                gbuf.at[:, :, pl.ds(slot * bi_pad, bi_pad), :],
                sems.at[slot, 0]),
            pltpu.make_async_copy(
                rx_ref.at[pl.ds(vi, 1), pl.ds(a0, bi_pad), :],
                rxbuf.at[:, pl.ds(slot * bi_pad, bi_pad), :],
                sems.at[slot, 1]),
            pltpu.make_async_copy(
                ry_ref.at[pl.ds(vi, 1), pl.ds(a0, bi_pad), :],
                rybuf.at[:, pl.ds(slot * bi_pad, bi_pad), :],
                sems.at[slot, 2]),
        ]
        return copies

    step0 = li * n_strips + ti
    slot = lax.rem(step0, 2)

    @pl.when(step0 == 0)
    def _():
        for c in dma(step0, slot):
            c.start()

    @pl.when(step0 + 1 < n_l * n_strips)
    def _():
        for c in dma(step0 + 1, lax.rem(step0 + 1, 2)):
            c.start()

    for c in dma(step0, slot):
        c.wait()

    b = base_ref[vi, li, ti]
    a0 = (b // 8) * 8
    rem = b - a0

    gband = gbuf[0, :, pl.ds(slot * bi_pad, bi_pad), :]
    rxband = rxbuf[0, pl.ds(slot * bi_pad, bi_pad), :]
    ryband = rybuf[0, pl.ds(slot * bi_pad, bi_pad), :]
    # non-negative dynamic shifts only (see _fwd_kernel note)
    gband = pltpu.roll(gband, bi_pad - rem, 1)[:, :bi_use]
    rxband = pltpu.roll(rxband, bi_pad - rem, 0)[:bi_use]
    ryband = pltpu.roll(ryband, bi_pad - rem, 0)[:bi_use]

    fx_full = ax * rxband + bx                       # [bi_use, W]
    fy_full = ay * ryband + by
    jf = lax.broadcasted_iota(jnp.int32, (bi_use, win_src), 1).astype(f32)
    r_iota = lax.broadcasted_iota(jnp.int32, (STRIP, win_v), 0).astype(f32)
    m_iota = lax.broadcasted_iota(jnp.int32, (STRIP, LANES), 1).astype(f32)
    u_rows = (ti * STRIP).astype(f32) + r_iota       # texel rows [STRIP, win_v]

    for tc in range(n_tiles):
        s0 = min(max(tc * LANES - 16, 0), w_img - win_src)
        fxs = fx_full[:, s0:s0 + win_src]
        fys = fy_full[:, s0:s0 + win_src]
        gs = gband[:, :, s0:s0 + win_src]
        lo = tc * LANES - 1.0
        hi = lo + LANES + 2.0
        mask = (fxs >= lo) & (fxs < hi)
        diff = jnp.where(mask, (jf + s0) - fxs, 1e9)
        cj = jnp.floor(jnp.min(diff)).astype(jnp.int32) - 1
        shift = tc * LANES + cj - s0
        # negative dynamic rolls miscompile on v5e Mosaic — use the cyclic
        # non-negative equivalent.  The double rem normalizes ARBITRARY shift
        # magnitudes: an all-masked tile derives cj from the 1e9 sentinel so
        # shift can be ~1e9 (its hats are all zero, any roll is harmless) —
        # do not "simplify" to a single rem or a win_src-shift form, that
        # reintroduces the negative-roll miscompile for sentinel tiles
        wshift = lax.rem(lax.rem(-shift, win_src) + win_src, win_src)
        wg = pltpu.roll(gs, wshift, 2)[:, :, :win_v]
        wfx = pltpu.roll(fxs, wshift, 1)[:, :win_v]
        wfy = pltpu.roll(fys, wshift, 1)[:, :win_v]
        v_cols = tc * LANES + m_iota                 # texel cols [STRIP, LANES]

        acc = jnp.zeros((4, STRIP, LANES), f32)
        n_dv_steps = (d_v + 31) // 32
        for du in range(d_u):
            fy_s = wfy[du:du + STRIP]                # [STRIP, win_v]
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy_s - u_rows))
            ghy = wg[:, du:du + STRIP, :] * hy[None]  # [4, STRIP, win_v]
            fx_s = wfx[du:du + STRIP]

            # dv loop: fori over 32-wide static blocks with roll-by-32
            # windows — bounds compile size (see _fwd_kernel dx loop)
            def dv_body(m, carry):
                acc_c, g_c, fx_c = carry
                for dvf in range(32):
                    hx = jnp.maximum(
                        0.0, 1.0 - jnp.abs(fx_c[:, dvf:dvf + LANES] - v_cols))
                    acc_c = acc_c + hx[None] * g_c[:, :, dvf:dvf + LANES]
                return (acc_c, pltpu.roll(g_c, win_v - 32, 2),
                        pltpu.roll(fx_c, win_v - 32, 1))

            acc, _, _ = lax.fori_loop(0, n_dv_steps, dv_body,
                                      (acc, ghy, fx_s))
        out_ref[0, 0, :, :, tc * LANES:(tc + 1) * LANES] = acc


def warp_adjoint(
    d_samp: jnp.ndarray,    # [V, L, 4, H, W] cotangent on warped samples
    rx: jnp.ndarray,        # [V, H, W]
    ry: jnp.ndarray,
    scal: jnp.ndarray,      # [V, L, 6]
    bands: AdjointBands,
    tex_h: int,
    tex_w: int,
    interpret: bool = False,
):
    """Exact warp transpose: d_samp -> d_tex [V, L, 4, tex_h, tex_w].

    Taps outside the texture (the zeros-padding region of
    ``grid_sample(padding_mode="zeros")``) contribute no gradient, which this
    kernel reproduces by only accumulating real texel positions.
    """
    v, l_planes = d_samp.shape[0], d_samp.shape[1]
    h, w_img = d_samp.shape[3], d_samp.shape[4]
    assert tex_h % STRIP == 0 and tex_w % LANES == 0, (tex_h, tex_w)
    # window lanes must not wrap around the image width
    assert min(512, w_img) >= LANES + bands.d_v, (w_img, bands)
    # dynamic lane rotates require power-of-two widths (v5e Mosaic)
    ws = min(512, w_img)
    assert ws & (ws - 1) == 0, w_img
    n_strips = tex_h // STRIP

    g_flat = d_samp.reshape(v * l_planes, 4, h, w_img)
    rx, ry, g_flat = _pad_pixel_rows(rx, ry, g_flat, pad_bot=bands.bi_pad)
    bases = adjoint_bases(scal, ry, tex_h, bands.bi_pad)  # [V, L, T]

    kernel = functools.partial(_adj_kernel, bands=bands, tex_w=tex_w)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(v, l_planes, n_strips),
            in_specs=[
                pl.BlockSpec((1, l_planes, 6),
                             lambda vi, li, ti, sref: (vi, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),   # rx
                pl.BlockSpec(memory_space=pl.ANY),   # ry
                pl.BlockSpec(memory_space=pl.ANY),   # g
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 4, STRIP, tex_w),
                lambda vi, li, ti, sref: (vi, li, 0, ti, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, 4, 2 * bands.bi_pad, w_img), jnp.float32),
                pltpu.VMEM((1, 2 * bands.bi_pad, w_img), jnp.float32),
                pltpu.VMEM((1, 2 * bands.bi_pad, w_img), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((v, l_planes, 4, tex_h, tex_w),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(bases, scal, rx, ry, g_flat)
    return out


def composite_bwd(warped, delta, g_color, g_depth, g_trans, eps: float = EPS,
                  g_disp=None, delta_disp=None):
    """Cotangents on the warped per-plane RGBA from cotangents on the
    composited outputs (pure XLA; the non-warp half of the fused VJP).

    With ``T_l = prod_{m<l}(1 - a_m + eps)``, ``w_l = a_l * T_l``
    (``gmpi/core/mpi.py:421-434``):

      d rgb_l   = w_l * g_color
      d alpha_l = T_l * e_l - (u_l + g_trans * T_total) / (1 - a_l + eps)

    where ``e_l = g_color . rgb_l + g_depth * delta_l [+ g_disp *
    delta_disp_l]`` and ``u_l = sum_{m>l} w_m e_m`` (suffix sum) — the
    expected-disparity output (``mpi.py:431``) is the same weighted sum
    with per-plane field ``delta_disp_l = 1/(dscale_l * q)``.

    Args:
        warped:  [V, L, 4, H, W] warped per-plane RGBA (fwd residual)
        delta:   [V, L, H, W] per-plane pixel depth ``dscale_l * q``
        g_color: [V, 3, H, W]; g_depth / g_trans / g_disp: [V, H, W] (or None)
        delta_disp: [V, L, H, W] per-plane disparity (required with g_disp)
    Returns d_warped [V, L, 4, H, W].
    """
    rgb = warped[:, :, :3]
    alpha = warped[:, :, 3]
    one_m = 1.0 - alpha + eps                         # [V, L, H, W]
    t_incl = jnp.cumprod(one_m, axis=1)
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[:, :1]), t_incl[:, :-1]], axis=1)  # T_l
    # optimization_barrier: XLA:TPU miscompiles the fused
    # cumprod -> mul -> flipped-cumsum -> div chain at production shapes
    # (far-plane d_alpha off by ~1e34 vs the same graph split in two, vs
    # TPU eager, and vs CPU — minimal repro in tools/probe_chain.py; a
    # barrier on t_excl or on u independently fixes it, mid-chain barriers
    # do not).  Keep BOTH barriers so a fusion-boundary shift can't
    # silently re-trigger the defect.
    t_excl = lax.optimization_barrier(t_excl)
    w = alpha * t_excl

    e = jnp.einsum("vchw,vlchw->vlhw", g_color, rgb)
    if g_depth is not None:
        e = e + g_depth[:, None] * delta
    if g_disp is not None:
        e = e + g_disp[:, None] * delta_disp
    we = w * e
    # u_l = suffix-exclusive cumsum of we along planes.  Computed by
    # shifting BEFORE the cumsum: the inclusive-cumsum-minus-self trick
    # catastrophically cancels when a near-opaque plane makes the suffix
    # terms ~1e-10-scale next to an O(1) we_l — and the division by
    # (1 - a + eps) below amplifies that loss to an O(1) gradient error.
    # ``reverse=True`` cumsum instead of flip/cumsum/flip: two fewer
    # full-stack materializations (~0.8 GB of HBM copies at 96x1024²)
    we_shift = jnp.concatenate([we[:, 1:], jnp.zeros_like(we[:, :1])], axis=1)
    u = lax.optimization_barrier(  # see barrier note above
        lax.cumsum(we_shift, axis=1, reverse=True))

    d_alpha = t_excl * e - u / one_m
    if g_trans is not None:
        d_alpha = d_alpha - (g_trans * t_incl[:, -1])[:, None] / one_m
    d_rgb = w[:, :, None] * g_color[:, None]
    return jnp.concatenate([d_rgb, d_alpha[:, :, None]], axis=2)


def _composite_bwd_kernel(scal_ref, warped_ref, q_ref, gc_ref, gd_ref, gt_ref,
                          gp_ref, *rest, L, eps, has_gd, has_gt,
                          has_gp=False, grad_tau=None, with_live=False,
                          has_nl=False):
    rest = list(rest)
    nl_ref = rest.pop(0) if has_nl else None
    out_ref = rest.pop(0)
    live_ref = rest.pop(0) if with_live else None
    t_ref = rest.pop(0)
    m_ref = rest.pop(0) if rest else None
    nl = (nl_ref[pl.program_id(0), pl.program_id(1)] if has_nl else None)
    """Per (view, pixel block): the composite backward as two in-register
    plane passes — forward transmittance products into a [L, rows, 128]
    scratch, then a back-to-front suffix accumulation emitting d_rgba.

    Same math as :func:`composite_bwd` (the XLA oracle), with two bonuses: no
    O(L)-pass XLA cumprod/cumsum materializations (the XLA form measured
    59 ms vs ~13 ms of pure HBM traffic at 96x1024^2), and no exposure to the
    XLA:TPU fused-chain miscompile that forced optimization_barriers there.
    """
    f32 = jnp.float32
    rows = warped_ref.shape[5]
    q = q_ref[0, 0, 0]                                # [rows, 128]
    qinv = (1.0 / q) if has_gp else None              # disparity field
    gc0 = gc_ref[0, 0, 0, 0]
    gc1 = gc_ref[0, 1, 0, 0]
    gc2 = gc_ref[0, 2, 0, 0]

    def pass1(l, carry):
        t, m = carry
        t_ref[l] = t
        if m_ref is not None:
            m_ref[l] = m
        a = warped_ref[0, 0, l, 3, 0]
        # max(1-a, 0) + eps, NOT 1-a+eps: the compiler reassociates the
        # latter to (1+eps)-a which rounds to exactly 0 at a=1 (fp32 can't
        # represent 1+1e-10) -> 0/0 = NaN in pass2's division.  The max form
        # is equal for a <= 1 and also guards the a = 1+delta interpolation
        # overshoot of the bf16x3 warp (delta ~ 1e-5), where dividing by a
        # signed near-zero would inject an O(1) d_alpha error.
        one_m = jnp.maximum(1.0 - a, 0.0) + eps
        if has_nl:
            one_m = jnp.where(l < nl, one_m, 1.0)  # see fat kernel note
        return t * one_m, jnp.minimum(m, one_m) if m_ref is not None else m

    t_total, _ = lax.fori_loop(
        0, L, pass1, (jnp.ones((rows, LANES), f32), jnp.ones((rows, LANES), f32)))

    gt_term = None
    if has_gt:
        gt_term = gt_ref[0, 0, 0] * t_total

    lane_i = lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    sub_i8 = lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

    def pass2(i, carry):
        u, flags = carry
        l = L - 1 - i
        r0 = warped_ref[0, 0, l, 0, 0]
        r1 = warped_ref[0, 0, l, 1, 0]
        r2 = warped_ref[0, 0, l, 2, 0]
        a = warped_ref[0, 0, l, 3, 0]
        t_excl = t_ref[l]
        e = gc0 * r0 + gc1 * r1 + gc2 * r2
        if has_gd:
            e = e + gd_ref[0, 0, 0] * (scal_ref[0, l, 4] * q)
        if has_gp:
            e = e + gp_ref[0, 0, 0] * ((1.0 / scal_ref[0, l, 4]) * qinv)
        one_m = jnp.maximum(1.0 - a, 0.0) + eps  # see pass1 note
        w = a * t_excl
        if has_nl:
            dead = l >= nl
            e = jnp.where(dead, 0.0, e)
            w = jnp.where(dead, 0.0, w)
        d_alpha = t_excl * e - u / one_m
        if has_gt:
            d_alpha = d_alpha - gt_term / one_m
        if m_ref is not None:
            # grad-safe sparsity (see _fwd_kernel's "grad" early-out): where
            # S = T_excl / min-factor < tau, every cotangent of this plane is
            # bounded by ~tau — zero them EXACTLY so the splat's per-subtile
            # live check skips the plane's hats + matmul entirely
            live_px = (t_excl / m_ref[l]) >= grad_tau
            w = jnp.where(live_px, w, 0.0)
            d_alpha = jnp.where(live_px, d_alpha, 0.0)
            if with_live:
                # per-plane liveness bitmap at lane l (sublane 0): lets the
                # splat skip a dead plane's DMA stream + strip loop outright
                any_live = jnp.any(live_px).astype(f32)
                flags = jnp.maximum(
                    flags,
                    jnp.where((lane_i == l) & (sub_i8 == 0), any_live, 0.0))
        out_ref[0, 0, l, 0, 0] = w * gc0
        out_ref[0, 0, l, 1, 0] = w * gc1
        out_ref[0, 0, l, 2, 0] = w * gc2
        out_ref[0, 0, l, 3, 0] = d_alpha
        return u + w * e, flags

    _, flags = lax.fori_loop(
        0, L, pass2, (jnp.zeros((rows, LANES), f32), jnp.zeros((8, LANES), f32)))
    if with_live:
        first = (pl.program_id(1) == 0) & (pl.program_id(2) == 0)

        @pl.when(first)
        def _():
            live_ref[0] = flags

        @pl.when(jnp.logical_not(first))
        def _():
            live_ref[0] = jnp.maximum(live_ref[0], flags)


def _composite_bwd_fat_kernel(scal_ref, q_ref, gc_ref, gd_ref, gt_ref, gp_ref,
                              *rest,
                              L, eps, has_gd, has_gt, has_gp, grad_tau,
                              with_live, part_l4s, sub_l4=None,
                              has_nl=False):
    """Fat composite backward: one STRIP per grid step (r4, strip-major).

    The block-partitioned version's [.., L, 4, .., br, 128] blocks are
    L x 4 strided 32 KB runs and measured ~4x over the kernel's data floor;
    here the strip's whole plane stack streams in as ``n_chunks`` contiguous
    ~2 MB copies, both passes run over VMEM-resident stacks, and d_samp
    leaves as ONE contiguous copy whose drain overlaps the next strip's
    stream-in + pass1.

    ``has_nl``: the fused fwd's grad path leaves dead planes' residual
    slots UNWRITTEN (garbage) and ships the per-strip live-plane count
    instead — planes ``l >= n_live`` are masked out of the transmittance
    recursion (their factor forced to 1) and of every cotangent term, so
    the garbage never propagates (the ``where`` masks select exact zeros
    even against NaN garbage).
    """
    rest = list(rest)
    nl_ref = rest.pop(0) if has_nl else None
    n_parts = len(part_l4s)
    warped_refs = [rest.pop(0) for _ in range(n_parts)]
    (out_any, live_ref,
     wstack, dstack, t_ref, m_ref, isem, osem) = rest
    f32 = jnp.float32
    vi = pl.program_id(0)
    si = pl.program_id(1)
    ns_total = pl.num_programs(1)
    step = vi * ns_total + si
    total = pl.num_programs(0) * ns_total
    rows = wstack.shape[2]
    offs = []
    o = 0
    for p in part_l4s:
        offs.append(o)
        o += p

    # warped parts / out_any are flat [(V*NS), L_k*4, R8, 128]: the fused
    # fwd's per-chunk residuals stream STRAIGHT from their own arrays into
    # the right wstack offsets — no XLA plane-axis concat of the residual
    # stack between fwd and backward (a ~2x 1.6 GB copy at 96x1024^2).
    # Single-stack callers instead stream uniform ``sub_l4`` slices of the
    # one ref with a DYNAMIC offset (no per-slice XLA copies).
    if sub_l4 is not None:
        assert n_parts == 1

        def dma_in(k):
            return pltpu.make_async_copy(
                warped_refs[0].at[pl.ds(step, 1), pl.ds(k * sub_l4, sub_l4)],
                wstack.at[:, pl.ds(k * sub_l4, sub_l4)],
                isem.at[lax.rem(k, 2) if not isinstance(k, int) else k % 2])
    else:
        def dma_in(k):
            return pltpu.make_async_copy(
                warped_refs[k].at[pl.ds(step, 1)],
                wstack.at[:, offs[k]:offs[k] + part_l4s[k]],
                isem.at[k % 2])

    n_stream = part_l4s[0] // sub_l4 if sub_l4 is not None else n_parts
    # two copies in flight (start k+2 before waiting k below)
    dma_in(0).start()
    if n_stream > 1:
        dma_in(1).start()

    # the previous strip's d_samp flush must land before pass2 overwrites
    # dstack — but pass1 and the stream-in run first, hiding the drain
    def flush(s):
        return pltpu.make_async_copy(
            dstack,
            out_any.at[pl.ds(s, 1)],
            osem.at[0])

    q = q_ref[0, 0]
    qinv = (1.0 / q) if has_gp else None
    gc0 = gc_ref[0, 0, 0]
    gc1 = gc_ref[0, 1, 0]
    gc2 = gc_ref[0, 2, 0]
    nl = nl_ref[vi, si] if has_nl else None

    def _plane_step(l, c):
        t, m = c
        t_ref[l] = t
        m_ref[l] = m
        a = wstack[0, l * 4 + 3]
        one_m = jnp.maximum(1.0 - a, 0.0) + eps   # see block kernel note
        if has_nl:
            # dead plane: factor 1 freezes t/m at their last live values
            # (a is garbage here; where() selects 1.0 even if a is NaN)
            one_m = jnp.where(l < nl, one_m, 1.0)
        return t * one_m, jnp.minimum(m, one_m)

    ones = jnp.ones((rows, LANES), f32)
    if sub_l4 is not None:
        def pass1_chunk(k, carry):
            @pl.when(k + 2 < n_stream)
            def _():
                dma_in(k + 2).start()

            dma_in(k).wait()

            def plane(j, c):
                return _plane_step(k * (sub_l4 // 4) + j, c)

            return lax.fori_loop(0, sub_l4 // 4, plane, carry)

        t_total, _ = lax.fori_loop(0, n_stream, pass1_chunk, (ones, ones))
    else:
        carry = (ones, ones)
        for k in range(n_parts):      # static unroll: parts are separate refs
            if k + 2 < n_parts:
                dma_in(k + 2).start()
            dma_in(k).wait()
            lo_k = offs[k] // 4

            def plane(j, c, lo_k=lo_k):
                return _plane_step(lo_k + j, c)

            carry = lax.fori_loop(0, part_l4s[k] // 4, plane, carry)
        t_total, _ = carry

    gt_term = None
    if has_gt:
        gt_term = gt_ref[0, 0] * t_total

    @pl.when(step > 0)
    def _():
        flush(step - 1).wait()

    lane_i = lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    sub_i8 = lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

    def pass2(i, carry):
        u, flags = carry
        l = L - 1 - i
        r0 = wstack[0, l * 4 + 0]
        r1 = wstack[0, l * 4 + 1]
        r2 = wstack[0, l * 4 + 2]
        a = wstack[0, l * 4 + 3]
        t_excl = t_ref[l]
        e = gc0 * r0 + gc1 * r1 + gc2 * r2
        if has_gd:
            e = e + gd_ref[0, 0] * (scal_ref[0, l, 4] * q)
        if has_gp:
            e = e + gp_ref[0, 0] * ((1.0 / scal_ref[0, l, 4]) * qinv)
        one_m = jnp.maximum(1.0 - a, 0.0) + eps
        w = a * t_excl
        if has_nl:
            # garbage r/a for dead planes: zero their contributions exactly
            # (u's suffix sum and every output term go through w/e)
            dead = l >= nl
            e = jnp.where(dead, 0.0, e)
            w = jnp.where(dead, 0.0, w)
        d_alpha = t_excl * e - u / one_m
        if has_gt:
            d_alpha = d_alpha - gt_term / one_m
        if grad_tau is not None:
            live_px = (t_excl / m_ref[l]) >= grad_tau
            w = jnp.where(live_px, w, 0.0)
            d_alpha = jnp.where(live_px, d_alpha, 0.0)
            if with_live:
                any_live = jnp.any(live_px).astype(f32)
                flags = jnp.maximum(
                    flags,
                    jnp.where((lane_i == l) & (sub_i8 == 0), any_live, 0.0))
        dstack[0, l * 4 + 0] = w * gc0
        dstack[0, l * 4 + 1] = w * gc1
        dstack[0, l * 4 + 2] = w * gc2
        dstack[0, l * 4 + 3] = d_alpha
        return u + w * e, flags

    _, flags = lax.fori_loop(
        0, L, pass2, (jnp.zeros((rows, LANES), f32), jnp.zeros((8, LANES), f32)))

    flush(step).start()

    @pl.when(step == total - 1)
    def _():
        flush(step).wait()

    if with_live:
        first = (pl.program_id(1) == 0)

        @pl.when(first)
        def _():
            live_ref[0] = flags

        @pl.when(jnp.logical_not(first))
        def _():
            live_ref[0] = jnp.maximum(live_ref[0], flags)


def _composite_bwd_fat(warped_f, scal, qf, gc, gd, gt, eps, interpret,
                       grad_tau, with_live, gp=None, n_live=None):
    """Per-strip fat composite backward (see :func:`_composite_bwd_fat_kernel`).

    ``warped_f`` may be one strip-major stack [V, NS, L, 4, R8, 128] or a
    LIST of per-chunk stacks [V, NS, L_k, 4, R8, 128] (the fused fwd's
    chunk residuals, streamed without a plane-axis concat).
    """
    parts = list(warped_f) if isinstance(warped_f, (list, tuple)) \
        else [warped_f]
    v, ns = parts[0].shape[0], parts[0].shape[1]
    r8 = parts[0].shape[4]
    l_planes = sum(p.shape[2] for p in parts)
    l4 = l_planes * 4
    sub_l4 = None
    if len(parts) == 1:
        # single stack: stream uniform ~2 MB slices of the one ref with a
        # dynamic in-kernel offset (no per-slice XLA copies)
        for sub_l4 in (32, 16, 8, 4):
            if l4 % sub_l4 == 0:
                break
    part_l4s = tuple(p.shape[2] * 4 for p in parts)
    w_flats = [p.reshape(v * ns, p.shape[2] * 4, r8, LANES) for p in parts]
    zero = jnp.zeros((v, ns, r8, LANES), jnp.float32)
    gdr = zero if gd is None else gd
    gtr = zero if gt is None else gt
    gpr = zero if gp is None else gp

    kernel = functools.partial(
        _composite_bwd_fat_kernel, L=l_planes, eps=eps,
        has_gd=gd is not None, has_gt=gt is not None, has_gp=gp is not None,
        grad_tau=grad_tau, with_live=with_live,
        part_l4s=part_l4s, sub_l4=sub_l4, has_nl=n_live is not None)
    field = pl.BlockSpec((1, 1, r8, LANES), lambda vi, si: (vi, si, 0, 0))
    nl_inputs, nl_specs = [], []
    if n_live is not None:
        assert grad_tau is not None, "n_live masking requires grad_tau"
        nl_inputs = [n_live.astype(jnp.int32)]
        nl_specs = [pl.BlockSpec((v, ns), lambda vi, si: (0, 0),
                                 memory_space=pltpu.SMEM)]
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(v, ns),
            in_specs=[
                pl.BlockSpec((1, l_planes, 6), lambda vi, si: (vi, 0, 0),
                             memory_space=pltpu.SMEM),
                field,
                pl.BlockSpec((1, 3, 1, r8, LANES),
                             lambda vi, si: (vi, 0, si, 0, 0)),
                field,
                field,
                field,
                *nl_specs,
                # warped parts (flat)
                *[pl.BlockSpec(memory_space=pl.ANY) for _ in w_flats],
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),   # d_samp (flat)
                pl.BlockSpec((1, 8, LANES), lambda vi, si: (vi, 0, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, l4, r8, LANES), jnp.float32),   # wstack
                pltpu.VMEM((1, l4, r8, LANES), jnp.float32),   # dstack
                pltpu.VMEM((l_planes, r8, LANES), jnp.float32),  # t
                pltpu.VMEM((l_planes, r8, LANES), jnp.float32),  # m
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((1,)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((v * ns, l4, r8, LANES), jnp.float32),
            jax.ShapeDtypeStruct((v, 8, LANES), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(scal, qf, gc, gdr, gtr, gpr, *nl_inputs, *w_flats)
    d_samp, live = outs
    d_samp = d_samp.reshape(v, ns, l_planes, 4, r8, LANES)
    if with_live:
        return d_samp, live[:, 0, :l_planes]
    return d_samp


def composite_bwd_pallas(warped_f, scal, qf, gc, gd=None, gt=None,
                         eps: float = EPS, interpret: bool = False,
                         block_rows: int = None, grad_tau=None,
                         with_live: bool = False, gp=None, n_live=None):
    """Pallas composite backward over subtile-flat stacks.

    warped_f [V, NS, L, 4, R8, 128] (strip-major — the forward's residual
    layout); qf [V, NS, R8, 128]; gc [V, 3, NS, R8, 128]; gd/gt optional
    [V, NS, R8, 128]; scal [V, L, 6].  Returns d_samp in the same strip-major
    [V, NS, L, 4, R8, 128] layout — the drop-in equivalent of transposing
    through the plane-major :func:`composite_bwd` (oracle-tested).

    ``grad_tau``: enable grad-safe sparsity — cotangents of planes whose
    ``S = T_excl / min-factor`` is below tau are zeroed exactly (their true
    magnitude is bounded by ~tau; the zeros let the splat skip them).

    ``with_live`` (requires grad_tau and L <= 128): additionally returns a
    per-plane liveness bitmap [V, L] float32 (>0 = some pixel live) so the
    splat can skip dead planes' DMA streams entirely.

    ``warped_f`` may be a LIST of per-chunk stacks [V, NS, L_k, 4, R8, 128]
    (fused-fwd chunk residuals): the fat backend streams them without a
    plane-axis concat; other backends concatenate.
    """
    is_parts = isinstance(warped_f, (list, tuple))
    first = warped_f[0] if is_parts else warped_f
    v, ns = first.shape[0], first.shape[1]
    l_planes = (sum(p.shape[2] for p in warped_f) if is_parts
                else warped_f.shape[2])
    r8 = first.shape[4]
    with_live_ok = grad_tau is not None and l_planes <= LANES
    if _COMP_BACKEND != "block" and block_rows is None:
        # fat per-strip variant when its resident stacks fit VMEM (the
        # block variant's strided L x 4 x 32 KB runs measured ~4x over the
        # data floor)
        fat_bytes = (2 * l_planes * 4 + 2 * l_planes) * r8 * LANES * 4
        if (_COMP_BACKEND == "fat" or fat_bytes + (8 << 20) < 88 << 20):
            return _composite_bwd_fat(warped_f, scal, qf, gc, gd, gt, eps,
                                      interpret, grad_tau,
                                      with_live and with_live_ok, gp=gp,
                                      n_live=n_live)
    if is_parts:
        warped_f = jnp.concatenate(warped_f, axis=2)
    if block_rows is None:
        # largest pixel block whose double-buffered in+out stacks + t/m
        # scratch fit the VMEM budget: the [.., L, 4, 1, br, 128] blocks are
        # L*4 strided 64*br-byte runs, so bigger blocks halve the per-run
        # DMA overhead that dominates this kernel
        block_rows = 8
        for br in (128, 64, 32, 16, 8):
            if r8 % br:
                continue
            if (4 * l_planes * 4 + 2 * l_planes) * br * LANES * 4 <= 80 << 20:
                block_rows = br
                break
    assert r8 % block_rows == 0, (r8, block_rows)
    split = r8 // block_rows
    with_live = with_live and grad_tau is not None and l_planes <= LANES

    # refine the pixel blocking: [.., R8, 128] -> [.., split, R8/split, 128]
    # (contiguous — free reshape); bounds the per-step VMEM block
    wr = warped_f.reshape(v, ns, l_planes, 4, split, block_rows, LANES)
    qr = qf.reshape(v, ns, split, block_rows, LANES)
    gcr = gc.reshape(v, 3, ns, split, block_rows, LANES)
    zero = jnp.zeros((v, ns, split, block_rows, LANES), jnp.float32)
    gdr = zero if gd is None else gd.reshape(v, ns, split, block_rows, LANES)
    gtr = zero if gt is None else gt.reshape(v, ns, split, block_rows, LANES)
    gpr = zero if gp is None else gp.reshape(v, ns, split, block_rows, LANES)

    kernel = functools.partial(_composite_bwd_kernel, L=l_planes, eps=eps,
                               has_gd=gd is not None, has_gt=gt is not None,
                               has_gp=gp is not None,
                               grad_tau=grad_tau, with_live=with_live,
                               has_nl=n_live is not None)
    if n_live is not None:
        assert grad_tau is not None, "n_live masking requires grad_tau"
    scratch = [pltpu.VMEM((l_planes, block_rows, LANES), jnp.float32)]
    if grad_tau is not None:
        scratch.append(pltpu.VMEM((l_planes, block_rows, LANES), jnp.float32))
    stack = pl.BlockSpec((1, 1, l_planes, 4, 1, block_rows, LANES),
                         lambda vi, si, ri: (vi, si, 0, 0, ri, 0, 0))
    field = pl.BlockSpec((1, 1, 1, block_rows, LANES),
                         lambda vi, si, ri: (vi, si, ri, 0, 0))
    out_shape = [jax.ShapeDtypeStruct(
        (v, ns, l_planes, 4, split, block_rows, LANES), jnp.float32)]
    out_specs = [stack]
    if with_live:
        out_shape.append(jax.ShapeDtypeStruct((v, 8, LANES), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 8, LANES),
                                      lambda vi, si, ri: (vi, 0, 0)))
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(v, ns, split),
            in_specs=[
                pl.BlockSpec((1, l_planes, 6), lambda vi, si, ri: (vi, 0, 0),
                             memory_space=pltpu.SMEM),
                stack,
                field,
                pl.BlockSpec((1, 3, 1, 1, block_rows, LANES),
                             lambda vi, si, ri: (vi, 0, si, ri, 0, 0)),
                field,
                field,
                field,
                *([pl.BlockSpec((v, ns), lambda vi, si, ri: (0, 0),
                                memory_space=pltpu.SMEM)]
                  if n_live is not None else []),
            ],
            out_specs=tuple(out_specs) if with_live else out_specs[0],
            scratch_shapes=scratch,
        ),
        out_shape=tuple(out_shape) if with_live else out_shape[0],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(scal, wr, qr, gcr, gdr, gtr, gpr,
      *([] if n_live is None else [n_live.astype(jnp.int32)]))
    if with_live:
        d_samp, live = outs
        return (d_samp.reshape(v, ns, l_planes, 4, r8, LANES),
                live[:, 0, :l_planes])
    return outs.reshape(v, ns, l_planes, 4, r8, LANES)


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
    precision=lax.Precision.HIGHEST,
    compute_dtype=None,
    with_warped: bool = True,
    with_disp: bool = False,
    warped_parts: bool = False,
):
    """Full fused MPI render forward: chained slab kernels front-to-back.

    Returns (color [V,3,H,W], depth [V,1,H,W], [disp [V,1,H,W] when
    ``with_disp``,] trans [V,1,H,W], warped [V,L,4,H,W]) — warped is the
    residual stack for the backward.  ``warped_parts=True`` returns the
    residual as the LIST of per-chunk stacks instead of concatenating
    (composite_bwd_pallas streams them directly — saves a ~2x stack copy).
    """
    v, l_planes = rgba.shape[0], rgba.shape[1]
    tex_h, tex_w = rgba.shape[3], rgba.shape[4]
    h, w_img = ray_dir.shape[2], ray_dir.shape[3]
    scal = jax.vmap(lambda e: plane_affine(dhw, e, tex_h, tex_w))(eye_pos)
    rx, ry, q = ray_fields(ray_dir.astype(jnp.float32), z_dir.astype(jnp.float32))
    rx, ry, q = flatten_pixels(rx), flatten_pixels(ry), flatten_pixels(q)
    pad_bot = max(PADY_BOT, max(b[2] if not isinstance(b, FusedBands) else b.by_pad
                                for _, _, b in plan))
    tex_pad = pad_textures(rgba.astype(compute_dtype or jnp.float32), pad_bot)
    n_base = 4 if with_disp else 3
    state = None
    warped_chunks = []
    n_live = None
    for lo, hi, bands in plan:
        # packed_io: the composite state (incl. the grad path's S/M
        # occlusion bitmap) chains between chunk kernels as ONE array —
        # no per-field repacks at chunk boundaries
        outs = warp_composite_fwd(
            tex_pad, rx, ry, q, scal[:, lo:hi], bands,
            early_out=early_out, eps=eps, interpret=interpret, carry=state,
            pad_bot=pad_bot, precision=precision, compute_dtype=compute_dtype,
            with_warped=with_warped, lo=lo, with_disp=with_disp,
            packed_io=True)
        state, w = outs[0], outs[1]
        if early_out == "grad":
            # global per-strip live-plane count = sum of chunk-local counts
            # (liveness is monotone across the chained chunks)
            nl_k = outs[2]
            n_live = nl_k if n_live is None else n_live + nl_k
        warped_chunks.append(w)
    # warped stays in the strip-major subtile-flat layout [V, NS, L, 4,
    # R8, 128] (the VJP consumes it there); the chunk concat on the plane
    # axis copies contiguous L_chunk x 262 KB runs per (view, strip)
    if not with_warped:
        warped = None
    elif warped_parts:
        warped = warped_chunks
    else:
        warped = jnp.concatenate(warped_chunks, axis=2)
    base = tuple(unflatten_pixels(x, h, w_img)
                 for x in ((state[:, 0:3],)
                           + tuple(state[:, 3 + i] for i in range(n_base - 1))))
    color = base[0]
    rest = tuple(x[:, None] for x in base[1:])  # depth[, disp], trans
    if early_out == "grad":
        return (color,) + rest + (warped, n_live)
    return (color,) + rest + (warped,)


@functools.lru_cache(maxsize=64)
def make_fused_slab_renderer(bands, splat_plan, tex_h: int, tex_w: int,
                             early_out: bool = False, eps: float = EPS,
                             interpret: bool = False,
                             precision=lax.Precision.HIGHEST,
                             compute_dtype=None,
                             with_disp: bool = False):
    """Fused Pallas *slab* renderer with an exact custom VJP.

    ``fn(rgba_slab, dhw_slab, ray_dir, eye_pos, z_dir) ->
    (color_pre [V,3,H,W], depth_pre [V,1,H,W], trans [V,1,H,W])`` — the
    segment partials of ``core.renderer.render_slab_partial``, so sharded
    renderers can run the production kernel per plane shard and combine
    across chips (``combine_segments``).  Bands must cover every shard's
    planes (SPMD: statics are shared across shards).  ``with_disp`` inserts
    the expected-disparity partial after depth (4-tuple partials — the
    generic ``combine_segments`` handles either arity).
    """
    bands = FusedBands(*bands)
    splat_plan = SplatPlan(*splat_plan)
    n_base = 4 if with_disp else 3

    def _fwd(rgba, dhw, ray_dir, eye_pos, z_dir, with_warped, early):
        v = rgba.shape[0]
        h, w_img = ray_dir.shape[2], ray_dir.shape[3]
        scal = jax.vmap(lambda e: plane_affine(dhw, e, tex_h, tex_w))(eye_pos)
        rx, ry, q = ray_fields(ray_dir.astype(jnp.float32),
                               z_dir.astype(jnp.float32))
        rxf = flatten_pixels(rx)
        ryf = flatten_pixels(ry)
        qf = flatten_pixels(q)
        pad_bot = max(PADY_BOT, bands.by_pad)
        tex_pad = pad_textures(
            rgba.astype(compute_dtype or jnp.float32), pad_bot)
        outs = warp_composite_fwd(
            tex_pad, rxf, ryf, qf, scal, bands, early_out=early, eps=eps,
            interpret=interpret, pad_bot=pad_bot, with_warped=with_warped,
            precision=precision, compute_dtype=compute_dtype,
            with_disp=with_disp)
        warped = outs[n_base]
        base = tuple(unflatten_pixels(x, h, w_img) for x in outs[:n_base])
        out = (base[0],) + tuple(x[:, None] for x in base[1:])
        return out, warped

    @jax.custom_vjp
    def fn(rgba, dhw, ray_dir, eye_pos, z_dir):
        out, _ = _fwd(rgba, dhw, ray_dir, eye_pos, z_dir, False, early_out)
        return out

    def fn_fwd(rgba, dhw, ray_dir, eye_pos, z_dir):
        # early_out=False: see make_fused_renderer.fn_fwd (occluder alpha
        # gradients need the hidden planes)
        out, warped = _fwd(rgba, dhw, ray_dir, eye_pos, z_dir, True, False)
        return out, (warped, dhw, ray_dir, eye_pos, z_dir)

    def fn_bwd(res, cot):
        warped, dhw, ray_dir, eye_pos, z_dir = res
        if with_disp:
            g_color, g_depth, g_disp, g_trans = cot
        else:
            g_color, g_depth, g_trans = cot
            g_disp = None
        v, l_pl = warped.shape[0], warped.shape[2]
        h, w_img = ray_dir.shape[2], ray_dir.shape[3]
        scal = jax.vmap(lambda e: plane_affine(dhw, e, tex_h, tex_w))(eye_pos)
        rx, ry, q = ray_fields(ray_dir.astype(jnp.float32),
                               z_dir.astype(jnp.float32))
        qf6 = flatten_pixels(q)
        gc6 = flatten_pixels(g_color)
        gd6 = None if g_depth is None else flatten_pixels(g_depth[:, 0])
        gt6 = None if g_trans is None else flatten_pixels(g_trans[:, 0])
        gp6 = None if g_disp is None else flatten_pixels(g_disp[:, 0])
        d_samp6 = composite_bwd_pallas(warped, scal, qf6, gc6, gd6, gt6,
                                       eps, interpret=interpret, gp=gp6)
        rxf, ryf = flatten_pixels(rx), flatten_pixels(ry)
        d_rgba = warp_splat(d_samp6, rxf, ryf, ry, scal, bands, splat_plan,
                            tex_h, tex_w, interpret=interpret,
                            precision=precision)
        return (d_rgba, jnp.zeros_like(dhw), jnp.zeros_like(ray_dir),
                jnp.zeros_like(eye_pos), jnp.zeros_like(z_dir))

    fn.defvjp(fn_fwd, fn_bwd)
    return fn


@functools.lru_cache(maxsize=64)
def make_fused_renderer(plan, adj_plan, tex_h: int, tex_w: int,
                        early_out: bool = True, eps: float = EPS,
                        interpret: bool = False,
                        precision=lax.Precision.HIGHEST,
                        compute_dtype=None,
                        composite_backend: str = "pallas",
                        grad_sparsity: bool = True,
                        with_disp: bool = False):
    """Build the fused MPI renderer with its exact custom VJP.

    ``plan`` is a tuple of ``(lo, hi, FusedBands)`` (see
    :func:`plan_fused_render`) and ``adj_plan`` a matching tuple of
    :class:`AdjointBands` (see :func:`plan_adjoint`); both are static, so the
    returned function is cached per configuration and safe to close over in
    jitted code.

    The VJP matches the reference renderer's semantics: gradients flow into
    the plane RGBA only (UV grid and depth under stop-gradient,
    ``gmpi/core/mpi.py:65,148``); pose/geometry inputs get zero cotangents.

    Returns ``fn(rgba, dhw, ray_dir, eye_pos, z_dir) ->
    (color [V,3,H,W], depth [V,1,H,W], trans [V,1,H,W])``; ``with_disp``
    inserts expected disparity (``mpi.py:431``) after depth in the outputs
    and handles its cotangent exactly in the VJP.
    """
    plan = tuple((int(lo), int(hi), FusedBands(*b)) for lo, hi, b in plan)
    # 2-field entries are SplatPlan (MXU splat backward); 3-field entries the
    # legacy texture-space AdjointBands
    use_splat = adj_plan and len(tuple(adj_plan[0])) == 2
    adj_plan = tuple((SplatPlan(*b) if use_splat else AdjointBands(*b))
                     for b in adj_plan)
    n_base = 4 if with_disp else 3

    @jax.custom_vjp
    def fn(rgba, dhw, ray_dir, eye_pos, z_dir):
        # with_warped=True EVEN AT INFERENCE: measured 34.6 ms vs 120.8 ms
        # dense at 96x1024^2 on v5e — Mosaic schedules the variant whose
        # only outputs are the small per-strip pixel blocks ~3.5x worse
        # than the one that also streams the big residual block.  The
        # discarded residual costs ~1.6 GB of HBM writes (~2 ms at peak)
        # and is dead right after the call.
        outs = render_mpi_fused_fwd(
            rgba, dhw, ray_dir, eye_pos, z_dir, plan,
            early_out=early_out, eps=eps, interpret=interpret,
            precision=precision, compute_dtype=compute_dtype,
            with_warped=True, with_disp=with_disp, warped_parts=True)
        return outs[:n_base]

    def fn_fwd(rgba, dhw, ray_dir, eye_pos, z_dir):
        # The plain T-threshold early-out is WRONG on the grad path: a
        # visible occluder's alpha gradient needs the composite of the planes
        # BEHIND it at O(1) — the u/(1-a+eps) division amplifies a skipped
        # plane's contribution by up to 1/eps.  The "grad" mode's S-criterion
        # (transmittance with the single most opaque factor removed) bounds
        # exactly that amplification, so its skips are safe to O(GRAD_TAU);
        # grad_sparsity=False falls back to processing every plane.
        outs = render_mpi_fused_fwd(
            rgba, dhw, ray_dir, eye_pos, z_dir, plan,
            early_out="grad" if grad_sparsity else False,
            eps=eps, interpret=interpret,
            precision=precision, compute_dtype=compute_dtype,
            with_disp=with_disp, warped_parts=True)
        warped = tuple(outs[n_base])
        n_live = outs[n_base + 1] if grad_sparsity else None
        return outs[:n_base], (warped, n_live, dhw, ray_dir, eye_pos, z_dir)

    def fn_bwd(res, cot):
        warped, n_live, dhw, ray_dir, eye_pos, z_dir = res
        if with_disp:
            g_color, g_depth, g_disp, g_trans = cot
        else:
            g_color, g_depth, g_trans = cot
            g_disp = None
        # warped: per-chunk strip-major stacks [V, NS, L_k, 4, R8, 128]
        v = warped[0].shape[0]
        l_all = sum(w.shape[2] for w in warped)
        h, w_img = ray_dir.shape[2], ray_dir.shape[3]
        scal = jax.vmap(lambda e: plane_affine(dhw, e, tex_h, tex_w))(eye_pos)
        rx, ry, q = ray_fields(ray_dir.astype(jnp.float32),
                               z_dir.astype(jnp.float32))
        # composite backward runs in the kernel's subtile-flat layout
        # (elementwise over pixels + reductions over planes: layout-free)
        qf6 = flatten_pixels(q)                          # [V, NS, R8, 128]
        gc6 = flatten_pixels(g_color)
        gd6 = None if g_depth is None else flatten_pixels(g_depth[:, 0])
        gt6 = None if g_trans is None else flatten_pixels(g_trans[:, 0])
        gp6 = None if g_disp is None else flatten_pixels(g_disp[:, 0])
        live_flags = None
        if composite_backend == "pallas":
            d_samp6 = composite_bwd_pallas(
                warped, scal, qf6, gc6, gd6, gt6, eps, interpret=interpret,
                grad_tau=GRAD_TAU if grad_sparsity else None,
                with_live=grad_sparsity, gp=gp6, n_live=n_live)
            if grad_sparsity and isinstance(d_samp6, tuple):
                d_samp6, live_flags = d_samp6
        else:
            # debug fallback (XLA composite backward is plane-major)
            warped = jnp.concatenate(warped, axis=2)
            if n_live is not None:
                # zero the unwritten dead-plane slots the pallas path masks
                lmask = (jnp.arange(l_all)[None, None, :] <
                         n_live[:, :, None])
                warped = jnp.where(lmask[..., None, None, None], warped, 0.0)
            warped_pm = jnp.transpose(warped, (0, 2, 3, 1, 4, 5))
            qf = qf6.reshape(v, -1, LANES)
            warped_f = warped_pm.reshape(v, l_all, 4, -1, LANES)
            delta = scal[:, :, 4][:, :, None, None] * qf[:, None]
            gcx = gc6.reshape(v, 3, -1, LANES)
            gdx = None if gd6 is None else gd6.reshape(v, -1, LANES)
            gtx = None if gt6 is None else gt6.reshape(v, -1, LANES)
            gpx = None if gp6 is None else gp6.reshape(v, -1, LANES)
            ddisp = None
            if gpx is not None:
                ddisp = (1.0 / scal[:, :, 4])[:, :, None, None] / qf[:, None]
            d_pm = composite_bwd(warped_f, delta, gcx, gdx, gtx, eps,
                                 g_disp=gpx, delta_disp=ddisp)
            d_samp6 = jnp.transpose(
                d_pm.reshape(v, l_all, 4, h // STRIP, -1, LANES),
                (0, 3, 1, 2, 4, 5))
        parts = []
        if use_splat:
            rxf, ryf = flatten_pixels(rx), flatten_pixels(ry)
            ns_, r8_ = rxf.shape[1], rxf.shape[2]
            # alias-chain the chunk splats into ONE full-stack buffer when
            # every chunk takes the fat kernel: each call writes only its
            # planes in place, so the per-chunk concat (a ~2x stack copy at
            # 96x1024^2) disappears
            chain = (_SPLAT_BACKEND != "classic" and tex_w % LANES == 0
                     and all(splat_fat_fits(tex_h, tex_w, ns_, r8_)
                             and win_rows(STRIP + b.d_y) <= OUT_PAD_BOT + 8
                             for _, _, b in plan))
            if chain:
                buf = None
                for (lo, hi, bands), spl in zip(plan, adj_plan):
                    buf = warp_splat(
                        d_samp6, rxf, ryf, ry, scal[:, lo:hi],
                        bands, spl, tex_h, tex_w, interpret=interpret,
                        precision=precision, lo=lo, live_flags=live_flags,
                        n_live=n_live, out_buf=buf, full_out=True)
                return (buf, jnp.zeros_like(dhw), jnp.zeros_like(ray_dir),
                        jnp.zeros_like(eye_pos), jnp.zeros_like(z_dir))
            for (lo, hi, bands), spl in zip(plan, adj_plan):
                parts.append(warp_splat(
                    d_samp6, rxf, ryf, ry, scal[:, lo:hi],
                    bands, spl, tex_h, tex_w, interpret=interpret,
                    precision=precision, lo=lo, live_flags=live_flags,
                    n_live=n_live))
        else:
            d_samp = unflatten_pixels(
                jnp.transpose(d_samp6, (0, 2, 3, 1, 4, 5)), h, w_img)
            for (lo, hi, _), abands in zip(plan, adj_plan):
                parts.append(warp_adjoint(
                    d_samp[:, lo:hi], rx, ry, scal[:, lo:hi], abands,
                    tex_h, tex_w, interpret=interpret))
        d_rgba = jnp.concatenate(parts, axis=1)
        return (d_rgba, jnp.zeros_like(dhw), jnp.zeros_like(ray_dir),
                jnp.zeros_like(eye_pos), jnp.zeros_like(z_dir))

    fn.defvjp(fn_fwd, fn_bwd)
    return fn

"""Differentiable MPI renderer — the core product of this framework.

Pure-jnp reference implementation: per-plane homography warp (inverse warp by
ray–plane intersection + bilinear sampling) followed by back-to-front
over-compositing with expected color / depth / disparity outputs.  Semantics
match the reference renderer exactly for the allclose bar:

* ray–plane intersect ``xyz = eye + ray * (d - z_eye) / z_ray``
  (``gmpi/core/mpi.py:74-79``);
* UV normalization ``u = 2x/width, v = 2y/height`` with align-corners handling
  and the 0.95 narrow-scale trick for ``align_corners=False``
  (``gmpi/core/mpi.py:15-23, 86-99``);
* bilinear sampling with zeros padding (``mpi.py:136-142``);
* per-pixel depth ``scale * (ray_dir . z_dir)``, disparity ``1/depth``
  (``mpi.py:148-152``);
* compositing weights ``alpha * cumprod(cat(1, 1 - alpha + 1e-10))[:-1]``
  along the plane axis, expected color/depth as weighted sums
  (``mpi.py:421-434``);
* UV grid and depth map under stop-gradient — gradients flow to plane RGBA
  only (``mpi.py:65, 148``);
* renderer pinned to float32 (``gmpi/core/mpi_renderer.py:403,446``).

The module also exposes *segment compositing* primitives: over-compositing is
associative over contiguous plane slabs via ``(rgb_pre, T)`` partials with the
combine ``(a + T_a * b, T_a * T_b)``.  That is the algebra used by the
plane-sharded multi-chip renderer (see ``gmpi_tpu/parallel``) and the
plane-chunked low-memory path (generalizing ``chunk_n_planes``,
``gmpi/eval/vis/render_video.py:55-77``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gmpi_tpu.ops.grid_sample import grid_sample_bilinear

# Narrow-scale factor for align_corners=False (``gmpi/core/mpi.py:15-23``).
ALIGN_CORNERS_FALSE_NARROW_SCALE = 0.95

COMPOSITE_EPS = 1e-10  # ``gmpi/core/mpi.py:421``


class RenderOutput(NamedTuple):
    color: jnp.ndarray  # [V, 3, H, W], range [0, 1] (pre the [-1,1] remap)
    depth: jnp.ndarray  # [V, 1, H, W]
    # Expected disparity ``sum_l w_l / depth_l`` (``gmpi/core/mpi.py:431``).
    # Populated by every path by default (gather / chunked / fused /
    # sharded); perf-critical callers that never consume it (the train
    # step, the bench) pass ``with_disp=False`` and get ``None``.  Note
    # ``disp != 1/depth`` pixelwise — both are weight-averaged
    # independently, as in the reference.
    disp: Optional[jnp.ndarray] = None  # [V, 1, H, W]


def homography_grid(
    dhw: jnp.ndarray,
    eye_pos: jnp.ndarray,
    ray_dir: jnp.ndarray,
    z_dir: jnp.ndarray,
    align_corners: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """UV sampling grid + per-pixel plane depth for a batch of (plane, camera)
    pairs — the geometry half of ``homography()`` (``gmpi/core/mpi.py:26-153``).

    Args:
        dhw:     [N, 3]   plane (depth, spatial_h, spatial_w)
        eye_pos: [N, 3]
        ray_dir: [N, 3, H, W] unit ray directions (world frame)
        z_dir:   [N, 3]   optical axis

    Returns:
        grid  [N, H, W, 2] in [-1, 1] (u, v), and depth [N, 1, H, W].
        Both are constants w.r.t. autodiff (stop_gradient applied by caller).
    """
    n, _, h, w = ray_dir.shape
    distance = dhw[:, 0:1]  # [N, 1]
    height = dhw[:, 1].reshape(n, 1, 1)
    width = dhw[:, 2].reshape(n, 1, 1)

    z_eye = eye_pos[:, 2:3]
    z_ray = ray_dir[:, 2, :, :]
    z_diff = (distance - z_eye).reshape(n, 1, 1)
    scale = z_diff / z_ray  # [N, H, W]

    x = eye_pos[:, 0].reshape(n, 1, 1) + ray_dir[:, 0, :, :] * scale
    y = eye_pos[:, 1].reshape(n, 1, 1) + ray_dir[:, 1, :, :] * scale

    u = 2.0 * x / width
    v = 2.0 * y / height
    if not align_corners:
        inside_u = (u >= -1.0) & (u <= 1.0)
        inside_v = (v >= -1.0) & (v <= 1.0)
        u = jnp.where(inside_u, u * ALIGN_CORNERS_FALSE_NARROW_SCALE, u)
        v = jnp.where(inside_v, v * ALIGN_CORNERS_FALSE_NARROW_SCALE, v)
    grid = jnp.stack([u, v], axis=-1)

    dist2depth = jnp.einsum("nchw,nc->nhw", ray_dir, z_dir, precision="highest")
    depth = (scale * dist2depth).reshape(n, 1, h, w)
    return grid, depth


def _sample(rgba, grid, align_corners, tiled_bands, patch_backend="xla"):
    """Warp-backend dispatch: portable per-pixel gather, or the tile-banded
    MXU warp (``gmpi_tpu/ops/tiled_warp.py`` — the TPU-native path, ~300x the
    gather formulation on v5e) when ``tiled_bands=(band_y, band_x)`` is given.
    """
    if tiled_bands is None:
        return grid_sample_bilinear(rgba, grid, align_corners=align_corners)
    from gmpi_tpu.ops.tiled_warp import grid_sample_tiled

    band_y, band_x = tiled_bands[0], tiled_bands[1]
    h, w = grid.shape[1], grid.shape[2]
    # 256-wide tiles measured ~15% faster than 128 at 96x1024^2 on v5e
    # (fewer patch slices; see docs/DESIGN.md round-1 perf record)
    tile = (8 if h % 8 == 0 else 1,
            256 if w % 256 == 0 else 128 if w % 128 == 0 else w)
    # large images: scan over tile-row groups to bound live hat/patch memory
    nty = h // tile[0]
    row_scan = nty > 32
    # ~64 scan steps measured best (rows_per_step=2 at 1024^2)
    rows_per_step = max(1, nty // 64) if row_scan else 1
    if patch_backend == "pallas":
        # DMA patch gather needs tile-aligned starts; bands carry the slack
        c = rgba.shape[1]
        y_align = max(1, 128 // c)
        band_y = ((band_y + 2 * (y_align - 1)) // y_align) * y_align
        band_x = ((band_x + 14) // 8) * 8
    if len(tiled_bands) == 4:
        # (band_y, band_x, adj_rows, adj_cols): exact scatter-free adjoint VJP
        from gmpi_tpu.ops.tiled_warp import make_tiled_warp_with_adjoint

        fn = make_tiled_warp_with_adjoint(
            band_y, band_x, (tiled_bands[2], tiled_bands[3]), tile=tile,
            align_corners=align_corners, row_scan=row_scan, rows_per_step=rows_per_step,
            patch_backend=patch_backend,
        )
        return fn(rgba, grid)
    return grid_sample_tiled(
        rgba, grid, band_y=band_y, band_x=band_x, tile=tile,
        align_corners=align_corners, row_scan=row_scan, rows_per_step=rows_per_step,
        patch_backend=patch_backend,
    )


def warp_planes(
    rgba: jnp.ndarray,
    dhw: jnp.ndarray,
    eye_pos: jnp.ndarray,
    ray_dir: jnp.ndarray,
    z_dir: jnp.ndarray,
    align_corners: bool = True,
    tiled_bands: Optional[Tuple[int, int]] = None,
    patch_backend: str = "xla",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Inverse-warp flattened planes into their cameras: the full
    ``homography()`` (``gmpi/core/mpi.py:26-153``).

    rgba [N, 4, Th, Tw] -> (rgb [N,3,H,W], disp [N,1,H,W], alpha [N,1,H,W]).
    """
    grid, depth = homography_grid(dhw, eye_pos, ray_dir, z_dir, align_corners)
    grid = lax.stop_gradient(grid)
    depth = lax.stop_gradient(depth)
    sampled = _sample(rgba, grid, align_corners, tiled_bands, patch_backend)
    rgb = sampled[:, :3]
    alpha = sampled[:, 3:4]
    disp = 1.0 / depth
    return rgb, disp, alpha


def composite(
    rgb: jnp.ndarray,
    alpha: jnp.ndarray,
    depth: jnp.ndarray,
    disp: Optional[jnp.ndarray] = None,
):
    """Front-to-back over-composite along the plane axis
    (``gmpi/core/mpi.py:419-434``).

    rgb [V, L, 3, H, W], alpha/depth/disp [V, L, 1, H, W]; plane 0 nearest.
    Returns (color [V,3,H,W], depth [V,1,H,W]) — plus expected disparity
    (``mpi.py:431``) as a third output when ``disp`` is given.
    """
    ones = jnp.ones_like(alpha[:, :1])
    shifted = jnp.concatenate([ones, 1.0 - alpha + COMPOSITE_EPS], axis=1)
    weights = alpha * jnp.cumprod(shifted, axis=1)[:, :-1]
    color = jnp.sum(weights * rgb, axis=1)
    depth_out = jnp.sum(weights * depth, axis=1)
    if disp is None:
        return color, depth_out
    disp_out = jnp.sum(weights * disp, axis=1)
    return color, depth_out, disp_out


def composite_sequential(
    rgb: jnp.ndarray,
    alpha: jnp.ndarray,
    depth: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Back-to-front sequential over-compositing — the numerical cross-check
    the reference keeps as ``MPI.old_forward`` (``gmpi/core/mpi.py:218-306``):
    ``out = rgb_l * a_l + out * (1 - a_l)`` from the farthest plane in.  Same
    math as :func:`composite` up to fp reassociation; used as a test oracle.
    """
    v, l = rgb.shape[0], rgb.shape[1]
    color = jnp.zeros_like(rgb[:, 0])
    depth_out = jnp.zeros_like(depth[:, 0])
    for i in range(l - 1, -1, -1):
        a = alpha[:, i]
        color = rgb[:, i] * a + color * (1.0 - a + COMPOSITE_EPS)
        depth_out = depth[:, i] * a + depth_out * (1.0 - a + COMPOSITE_EPS)
    return color, depth_out


def composite_partial(
    rgb: jnp.ndarray,
    alpha: jnp.ndarray,
    depth: jnp.ndarray,
    disp: Optional[jnp.ndarray] = None,
):
    """Composite one contiguous plane *slab* to premultiplied partials.

    Returns ``(color_pre [V,3,H,W], depth_pre [V,1,H,W], trans [V,1,H,W])``
    where ``trans`` is the slab's total transmittance ``prod(1 - a + eps)``;
    with ``disp`` given, a premultiplied expected-disparity partial
    (``gmpi/core/mpi.py:431``) is inserted before ``trans``.  Slabs combine
    front-to-back with :func:`combine_segments` — the associativity that
    makes plane-sharding across chips exact.
    """
    trans = jnp.prod(1.0 - alpha + COMPOSITE_EPS, axis=1)
    if disp is None:
        color, depth_out = composite(rgb, alpha, depth)
        return color, depth_out, trans
    color, depth_out, disp_out = composite(rgb, alpha, depth, disp)
    return color, depth_out, disp_out, trans


def combine_segments(front, back):
    """Over-combine two adjacent slab partials (front first).

    Partials are ``(*premultiplied, trans)`` tuples — any number of
    premultiplied channels (color, depth[, disp]) followed by the slab
    transmittance: ``(x_f + T_f * x_b ..., T_f * T_b)``."""
    tf_, tb = front[-1], back[-1]
    return tuple(f + tf_ * b for f, b in zip(front[:-1], back[:-1])) + (
        tf_ * tb,)


def render_mpi(
    rgba: jnp.ndarray,
    dhw: jnp.ndarray,
    ray_dir: jnp.ndarray,
    eye_pos: jnp.ndarray,
    z_dir: jnp.ndarray,
    align_corners: bool = True,
    tiled_bands: Optional[Tuple[int, int]] = None,
    stop_pose_grad: bool = True,
    patch_backend: str = "xla",
) -> RenderOutput:
    """Render a batch of MPIs into their cameras (one camera per MPI).

    The flattened-planes strategy of ``MPI.forward`` (``gmpi/core/mpi.py:308-436``):
    all ``V x L`` (view, plane) pairs go through one batched homography +
    bilinear sample, then one vectorized composite.

    Args:
        rgba:    [V, L, 4, Th, Tw], RGB and alpha in [0, 1], plane 0 nearest.
        dhw:     [L, 3] or [V, L, 3] plane (depth, height, width).
        ray_dir: [V, 3, H, W]; eye_pos / z_dir: [V, 3].

    Returns ``RenderOutput(color [V,3,H,W] in [0,1], depth [V,1,H,W])``.
    """
    v, l_planes = rgba.shape[0], rgba.shape[1]
    th, tw = rgba.shape[3], rgba.shape[4]
    h, w = ray_dir.shape[2], ray_dir.shape[3]

    rgba = rgba.astype(jnp.float32)
    if dhw.ndim == 2:
        dhw = jnp.broadcast_to(dhw[None], (v, l_planes, 3))

    flat_rgba = rgba.reshape(v * l_planes, 4, th, tw)
    flat_dhw = dhw.reshape(v * l_planes, 3).astype(jnp.float32)
    flat_ray = jnp.broadcast_to(ray_dir[:, None], (v, l_planes, 3, h, w)).reshape(
        v * l_planes, 3, h, w
    ).astype(jnp.float32)
    flat_eye = jnp.broadcast_to(eye_pos[:, None], (v, l_planes, 3)).reshape(v * l_planes, 3).astype(jnp.float32)
    flat_z = jnp.broadcast_to(z_dir[:, None], (v, l_planes, 3)).reshape(v * l_planes, 3).astype(jnp.float32)

    grid, depth = homography_grid(flat_dhw, flat_eye, flat_ray, flat_z, align_corners)
    if stop_pose_grad:
        # reference semantics: UV grid under no_grad -> grads reach RGBA only
        # (``gmpi/core/mpi.py:65``)
        grid = lax.stop_gradient(grid)
        depth = lax.stop_gradient(depth)
        sampled = _sample(flat_rgba, grid, align_corners, tiled_bands, patch_backend)
    else:
        # BASELINE extension: differentiable pose — d(color)/d(camera) flows
        # through the sampling grid and the per-pixel depth.  Uses the plain
        # autodiff warp (the custom-VJP adjoint cuts grid gradients).
        bands2 = tiled_bands[:2] if tiled_bands is not None else None
        sampled = _sample(flat_rgba, grid, align_corners, bands2)

    # match reference fp order: disp = 1/depth, then depth = 1/disp
    # (``gmpi/core/mpi.py:151, 411``).
    disp = 1.0 / depth
    depth = 1.0 / disp

    rgb = sampled[:, :3].reshape(v, l_planes, 3, h, w)
    alpha = sampled[:, 3:4].reshape(v, l_planes, 1, h, w)
    depth = depth.reshape(v, l_planes, 1, h, w)
    disp = disp.reshape(v, l_planes, 1, h, w)

    color, depth_out, disp_out = composite(rgb, alpha, depth, disp)
    return RenderOutput(color=color, depth=depth_out, disp=disp_out)


def render_mpi_chunked(
    rgba: jnp.ndarray,
    dhw: jnp.ndarray,
    ray_dir: jnp.ndarray,
    eye_pos: jnp.ndarray,
    z_dir: jnp.ndarray,
    plane_chunk: int,
    align_corners: bool = True,
    remat: bool = False,
    tiled_bands: Optional[Tuple[int, int]] = None,
    patch_backend: str = "xla",
    with_disp: bool = True,
) -> RenderOutput:
    """Memory-bounded render: planes processed in contiguous front-to-back
    slabs of size ``plane_chunk`` via ``lax.scan`` + segment compositing.

    TPU-native generalization of the reference's ``chunk_n_planes`` memory
    relief (``gmpi/eval/vis/render_video.py:55-77``): peak footprint is one
    slab's warped planes instead of all ``L``.  ``remat=True`` additionally
    rematerializes each slab's warp in the backward pass instead of saving
    residuals across the scan — required for fwd+bwd at 96 planes x 1024²
    within one chip's HBM (trades ~2x warp FLOPs for O(L/chunk) less live
    memory).
    """
    v, l_planes = rgba.shape[0], rgba.shape[1]
    assert l_planes % plane_chunk == 0, (l_planes, plane_chunk)
    n_chunks = l_planes // plane_chunk
    if dhw.ndim == 2:
        dhw = jnp.broadcast_to(dhw[None], (v, l_planes, 3))

    rgba_c = rgba.reshape(v, n_chunks, plane_chunk, 4, *rgba.shape[3:]).swapaxes(0, 1)
    dhw_c = dhw.reshape(v, n_chunks, plane_chunk, 3).swapaxes(0, 1)

    h, w = ray_dir.shape[2], ray_dir.shape[3]

    init = (
        (jnp.zeros((v, 3, h, w), jnp.float32),
         jnp.zeros((v, 1, h, w), jnp.float32))
        + ((jnp.zeros((v, 1, h, w), jnp.float32),) if with_disp else ())
        + (jnp.ones((v, 1, h, w), jnp.float32),)
    )

    def _out(carry):
        if with_disp:
            color, depth, disp, _ = carry
            return RenderOutput(color=color, depth=depth, disp=disp)
        color, depth, _ = carry
        return RenderOutput(color=color, depth=depth)

    if tiled_bands is not None and len(tiled_bands) > 0 and isinstance(tiled_bands[0], (tuple, list)):
        # per-chunk bands: plane extents grow front-to-back, so near slabs
        # warp/splat with much smaller bands than the all-plane worst case
        # (warp FLOPs scale with band area).  Chunks unroll in Python —
        # one compiled slab body per distinct band set.
        assert len(tiled_bands) == n_chunks, (len(tiled_bands), n_chunks)
        carry = init
        for k in range(n_chunks):
            fn = lambda r, d, b=tuple(tiled_bands[k]): render_slab_partial(
                r, d, ray_dir, eye_pos, z_dir, align_corners, b, patch_backend,
                with_disp=with_disp)
            if remat:
                fn = jax.checkpoint(fn)
            carry = combine_segments(carry, fn(rgba_c[k], dhw_c[k]))
        return _out(carry)

    slab_fn = render_slab_partial
    if remat:
        slab_fn = jax.checkpoint(
            lambda r, d: render_slab_partial(r, d, ray_dir, eye_pos, z_dir, align_corners,
                                             tiled_bands, patch_backend,
                                             with_disp=with_disp)
        )

    def body(carry, slab):
        slab_rgba, slab_dhw = slab
        if remat:
            out = slab_fn(slab_rgba, slab_dhw)
        else:
            out = slab_fn(slab_rgba, slab_dhw, ray_dir, eye_pos, z_dir, align_corners,
                          tiled_bands, patch_backend, with_disp=with_disp)
        return combine_segments(carry, out), None

    carry, _ = lax.scan(body, init, (rgba_c, dhw_c))
    return _out(carry)


def render_slab_partial(
    rgba: jnp.ndarray,
    dhw: jnp.ndarray,
    ray_dir: jnp.ndarray,
    eye_pos: jnp.ndarray,
    z_dir: jnp.ndarray,
    align_corners: bool = True,
    tiled_bands: Optional[Tuple[int, int]] = None,
    patch_backend: str = "xla",
    with_disp: bool = False,
):
    """Warp + partially composite one plane slab; returns slab partials for
    :func:`combine_segments` (``with_disp``: 4-tuple incl. disparity)."""
    v, l_planes = rgba.shape[0], rgba.shape[1]
    th, tw = rgba.shape[3], rgba.shape[4]
    h, w = ray_dir.shape[2], ray_dir.shape[3]
    flat_rgba = rgba.astype(jnp.float32).reshape(v * l_planes, 4, th, tw)
    flat_dhw = dhw.reshape(v * l_planes, 3).astype(jnp.float32)
    flat_ray = jnp.broadcast_to(ray_dir[:, None], (v, l_planes, 3, h, w)).reshape(
        v * l_planes, 3, h, w
    ).astype(jnp.float32)
    flat_eye = jnp.broadcast_to(eye_pos[:, None], (v, l_planes, 3)).reshape(v * l_planes, 3).astype(jnp.float32)
    flat_z = jnp.broadcast_to(z_dir[:, None], (v, l_planes, 3)).reshape(v * l_planes, 3).astype(jnp.float32)
    rgb, disp, alpha = warp_planes(flat_rgba, flat_dhw, flat_eye, flat_ray, flat_z, align_corners,
                                   tiled_bands, patch_backend)
    depth = 1.0 / disp
    rgb = rgb.reshape(v, l_planes, 3, h, w)
    alpha = alpha.reshape(v, l_planes, 1, h, w)
    depth = depth.reshape(v, l_planes, 1, h, w)
    if with_disp:
        disp = disp.reshape(v, l_planes, 1, h, w)
        return composite_partial(rgb, alpha, depth, disp)
    return composite_partial(rgb, alpha, depth)


def plan_fused(
    dhw: jnp.ndarray,
    ray_dir,
    eye_pos,
    z_dir,
    tex_h: int,
    tex_w: int,
    margin: int = 2,
    align_corners: bool = True,
):
    """Host-side planning for the fused Pallas renderer: per-chunk forward
    bands (:func:`gmpi_tpu.ops.pallas_warp.plan_fused_render`) and matching
    adjoint bands.  Returns a hashable ``(plan, adj_plan)`` pair for
    :func:`render_mpi_fused`.  Must be called outside jit with concrete pose
    arrays; for training, pass poses at the truncation-range corners so the
    static bands cover every pose the sampler can draw.
    """
    from gmpi_tpu.ops import pallas_warp as pw

    assert align_corners, (
        "the fused Pallas renderer implements align_corners=True coordinates "
        "only (plane_affine); use the tiled/gather paths for False")
    # planning is host work: pin it to the CPU backend — through a remote
    # accelerator tunnel the same math measured 143 s (device dispatches +
    # [V, H, W] transfers per plane) vs ~7 s on the host
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        dhw = jnp.asarray(np.asarray(dhw))
        ray_dir = jnp.asarray(np.asarray(ray_dir), jnp.float32)
        eye_pos = jnp.asarray(np.asarray(eye_pos))
        z_dir = jnp.asarray(np.asarray(z_dir), jnp.float32)
        scal = jax.vmap(lambda e: pw.plane_affine(dhw, e, tex_h, tex_w))(eye_pos)
        rx, ry, _ = pw.ray_fields(ray_dir, z_dir)
        plan = pw.plan_fused_render(scal, rx, ry, margin=margin)
        adj = pw.plan_splat(scal, ry, plan, tex_h)
    plan = tuple((int(lo), int(hi), b) for lo, hi, b in plan)
    return plan, tuple(adj)


def render_mpi_fused(
    rgba: jnp.ndarray,
    dhw: jnp.ndarray,
    ray_dir: jnp.ndarray,
    eye_pos: jnp.ndarray,
    z_dir: jnp.ndarray,
    plans,
    early_out: bool = True,
    interpret: bool = False,
    precision="bf16x3",
    compute_dtype=None,
    with_disp: bool = True,
) -> RenderOutput:
    """Render with the fused Pallas warp+composite kernel (TPU fast path).

    Same semantics as :func:`render_mpi` (stop-gradient pose, gradients to
    RGBA only, fp32) with an exact custom VJP; ``plans`` comes from
    :func:`plan_fused` / ``bands.fused_plans_for_config``.

    ``precision``: ``"bf16x3"`` (default — split-operand fp32-faithful MXU
    mode, ~4e-5 rel err at a third of HIGHEST's passes; the benchmarked
    configuration) or a ``lax.Precision``.  ``compute_dtype=jnp.bfloat16``
    halves texture DMA + the padded-texture HBM footprint (training-scale
    memory relief; ~2e-3 rel forward err, fp32 accumulation).
    ``with_disp=False`` drops the expected-disparity output/cotangent work
    (the train step and the bench use this).
    """
    from gmpi_tpu.ops.pallas_warp import make_fused_renderer

    plan, adj_plan = plans
    tex_h, tex_w = rgba.shape[-2], rgba.shape[-1]
    fn = make_fused_renderer(plan, adj_plan, tex_h, tex_w, early_out=early_out,
                             interpret=interpret, precision=precision,
                             compute_dtype=compute_dtype, with_disp=with_disp)
    outs = fn(rgba.astype(jnp.float32), dhw.astype(jnp.float32),
              ray_dir, eye_pos, z_dir)
    if with_disp:
        color, depth, disp, _ = outs
        return RenderOutput(color=color, depth=depth, disp=disp)
    color, depth, _ = outs
    return RenderOutput(color=color, depth=depth)


def render_mpi_fused_remat(
    rgba: jnp.ndarray,
    dhw: jnp.ndarray,
    ray_dir: jnp.ndarray,
    eye_pos: jnp.ndarray,
    z_dir: jnp.ndarray,
    plans,
    interpret: bool = False,
    precision="bf16x3",
    compute_dtype=None,
    with_disp: bool = True,
) -> RenderOutput:
    """Memory-rematerialized fused render: each plan chunk renders through
    the slab kernel under ``jax.checkpoint`` and the slab partials combine
    associatively, so the backward holds only ONE chunk's warped residual +
    cotangants at a time (~1/n_chunks of :func:`render_mpi_fused`'s peak —
    the difference between OOM and fitting 96x1024^2 training on a 16 GB
    chip).  Cost: each slab's forward runs twice (fwd + recompute in bwd).

    Matches :func:`render_mpi_fused` semantics (reference contract
    ``gmpi/core/mpi.py:308-436``); exactness of the slab VJPs and the
    combine algebra is oracle-tested.
    """
    from gmpi_tpu.ops.pallas_warp import make_fused_slab_renderer

    plan, adj_plan = plans
    tex_h, tex_w = rgba.shape[-2], rgba.shape[-1]
    rgba = rgba.astype(jnp.float32)
    dhw = dhw.astype(jnp.float32)
    carry = None
    for (lo, hi, bands), spl in zip(plan, adj_plan):
        fn = make_fused_slab_renderer(
            tuple(bands), tuple(spl), tex_h, tex_w, interpret=interpret,
            precision=precision, compute_dtype=compute_dtype,
            with_disp=with_disp)

        @functools.partial(jax.checkpoint, static_argnums=())
        def slab(r, d, fn=fn):
            return fn(r, d, ray_dir, eye_pos, z_dir)

        part = slab(rgba[:, lo:hi], dhw[lo:hi])
        carry = part if carry is None else combine_segments(carry, part)
    if with_disp:
        color, depth, disp, _ = carry
        return RenderOutput(color=color, depth=depth, disp=disp)
    color, depth, _ = carry
    return RenderOutput(color=color, depth=depth)


def ray_coverage_ok(
    dhw_last: jnp.ndarray,
    eye_pos: jnp.ndarray,
    ray_dir: jnp.ndarray,
    z_dir: jnp.ndarray,
    align_corners: bool = True,
) -> jnp.ndarray:
    """Jittable per-batch validity of the in-render ray-coverage invariant:
    True iff every ray of every view intersects the *last* plane inside its
    extent (``gmpi/core/mpi.py:381-395`` checks this on every forward).

    dhw_last [3] (or [V, 3]), eye_pos/z_dir [V, 3], ray_dir [V, 3, H, W].
    """
    v = ray_dir.shape[0]
    dl = jnp.asarray(dhw_last, jnp.float32)
    if dl.ndim == 1:
        dl = jnp.broadcast_to(dl[None], (v, 3))
    grid, _ = homography_grid(
        dl, eye_pos.astype(jnp.float32), ray_dir.astype(jnp.float32),
        z_dir.astype(jnp.float32), align_corners)
    return jnp.all(jnp.abs(grid) <= 1.0)


def poison_if_rays_escape(
    color: jnp.ndarray,
    dhw_last: jnp.ndarray,
    eye_pos: jnp.ndarray,
    ray_dir: jnp.ndarray,
    z_dir: jnp.ndarray,
    align_corners: bool = True,
) -> jnp.ndarray:
    """Debug-mode runtime analogue of ``assert_not_out_of_last_plane``
    (``gmpi/core/mpi.py:103-128, 381-395``): NaN-poison the rendered color
    when any ray exits the last plane's extent, so a bad (pose, volume)
    combination surfaces loudly at the consumer instead of silently
    compositing zeros-padding.  Jit-safe (no host callback); enable in tests,
    smoke runs, and via ``TrainHparams.debug_ray_check``."""
    ok = ray_coverage_ok(dhw_last, eye_pos, ray_dir, z_dir, align_corners)
    return jnp.where(ok, color, jnp.float32(jnp.nan))


def check_rays_hit_last_plane(
    dhw_last: jnp.ndarray,
    eye_pos: jnp.ndarray,
    ray_dir: jnp.ndarray,
    z_dir: jnp.ndarray,
    align_corners: bool = True,
) -> bool:
    """Eager (non-jit) validation that every ray intersects the last plane
    inside its extent — the ``assert_not_out_of_last_plane`` diagnostic
    (``gmpi/core/mpi.py:103-128, 381-395``).  Call from host code / tests."""
    grid, _ = homography_grid(dhw_last, eye_pos, ray_dir, z_dir, align_corners)
    u = grid[..., 0]
    v = grid[..., 1]
    ok = bool(jnp.all(u >= -1) & jnp.all(u <= 1) & jnp.all(v >= -1) & jnp.all(v <= 1))
    return ok

"""Static warp-band estimation for the tile-banded MXU warp.

The tiled warp needs compile-time band sizes covering each output tile's
texture-coordinate span (``ops/tiled_warp.required_bands``).  Spans depend on
the camera pose; for a truncated pose distribution the worst case is at the
corners of the (yaw, pitch) range, so sampling extreme + center poses once at
setup gives safe static bands for every training/eval render under that
distribution.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import poses as poses_mod
from gmpi_tpu.core.geometry import PlaneGeometry
from gmpi_tpu.core.renderer import homography_grid
from gmpi_tpu.ops.tiled_warp import required_bands


def _round_up(x: int, m: int = 8) -> int:
    return ((x + m - 1) // m) * m


def _corner_rays(camera_cfg, fov_deg: float, img_h: int, img_w: int):
    """Rays from the 9 corner/center poses of the truncated (yaw, pitch)
    range — the worst-case pose set all static band planning uses."""
    c = camera_cfg
    n = c.n_truncated_stds
    yaws, pitches = [], []
    for sy in (-n, 0.0, n):
        for sp in (-n, 0.0, n):
            yaws.append(c.yaw_mean + sy * c.yaw_std)
            pitches.append(c.pitch_mean + sp * c.pitch_std)
    yaws = jnp.asarray(yaws, jnp.float32).reshape(-1, 1)
    pitches = jnp.asarray(pitches, jnp.float32).reshape(-1, 1)
    c2w, _, _ = poses_mod.sample_sphere_poses(None, len(yaws), c, yaws, pitches)
    intr = cam.intrinsics_from_fov(fov_deg, img_h, img_w)
    return cam.generate_rays(intr, c2w)


def estimate_bands(
    geom: PlaneGeometry,
    camera_cfg: poses_mod.SphereCameraConfig,
    fov_deg: float,
    img_h: int,
    img_w: int,
    margin: float = 1.15,
    tile: Optional[Tuple[int, int]] = None,
) -> Tuple[int, int]:
    """Safe (band_y, band_x) for all poses within ±n_truncated_stds."""
    ray_dir, eye, z_dir = _corner_rays(camera_cfg, fov_deg, img_h, img_w)

    v = ray_dir.shape[0]
    l = geom.n_planes
    dhw = jnp.broadcast_to(geom.dhw[None], (v, l, 3)).reshape(v * l, 3)
    ray = jnp.broadcast_to(ray_dir[:, None], (v, l, 3, img_h, img_w)).reshape(v * l, 3, img_h, img_w)
    eye_f = jnp.broadcast_to(eye[:, None], (v, l, 3)).reshape(v * l, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (v, l, 3)).reshape(v * l, 3)
    grid, _ = homography_grid(dhw, eye_f, ray, z_f)
    if tile is None:
        # must mirror core/renderer._sample's tile heuristic
        tile = (8 if img_h % 8 == 0 else 1,
                256 if img_w % 256 == 0 else 128 if img_w % 128 == 0 else img_w)
    tex_shape = (v * l, 4, img_h, img_w)  # texture assumed img-sized
    by, bx = required_bands(tex_shape, grid, tile=tile)
    by = _round_up(int(np.ceil(by * margin)))
    bx = _round_up(int(np.ceil(bx * margin)))

    # adjoint (splat) output bands for the scatter-free VJP; only valid when
    # the warp is monotone along both axes over this pose range
    from gmpi_tpu.ops.tiled_warp_adjoint import check_monotone, required_output_bands

    if check_monotone(tex_shape, grid):
        # adjoint runs on taller texture tiles (32 rows) to amortize band
        # slicing overlap
        # 512-wide adjoint tiles amortize the static band margin (measured
        # 864 -> 534 ms at 96x1024^2 on v5e; see docs/DESIGN.md)
        atile = (32 if img_h % 32 == 0 else tile[0],
                 512 if img_w % 512 == 0 else 256 if img_w % 256 == 0 else tile[1])
        pbr, pbc = required_output_bands(tex_shape, grid, tile=atile)
        pbr = _round_up(int(np.ceil(pbr * margin)))
        pbc = _round_up(int(np.ceil(pbc * margin)))
        return by, bx, pbr, pbc
    return by, bx


def fused_plans_for_config(cfg, img_size: Optional[int] = None,
                           n_planes: Optional[int] = None, margin: int = 3):
    """Fused-renderer plans (forward chunk bands + splat plans) covering the
    config's whole truncated pose range: planned over the 9 corner/center
    poses, so the static bands are safe for every pose the training sampler
    can draw (validate with ``pallas_warp.fused_bands_ok``)."""
    import dataclasses

    from gmpi_tpu.core.renderer import plan_fused

    img = img_size or cfg.hparams.img_size
    tex = cfg.hparams.tex_size
    planes = dataclasses.replace(cfg.planes, n_planes=n_planes or cfg.planes.n_planes)
    geom = dataclasses.replace(cfg, planes=planes).plane_geometry()
    ray_dir, eye, z_dir = _corner_rays(cfg.camera, cfg.fov_deg, img, img)
    return plan_fused(jnp.asarray(geom.dhw), ray_dir, eye, z_dir, tex, tex,
                      margin=margin, align_corners=cfg.planes.align_corners)


def fused_slab_plan_for_config(cfg, img_size: Optional[int] = None,
                               n_planes: Optional[int] = None, margin: int = 3):
    """Single (FusedBands, SplatPlan) covering EVERY plane of the config —
    the static band set of the fused *slab* renderer inside the plane-sharded
    multi-chip path (``parallel/render.py``): shard_map is SPMD, so all plane
    shards share one compiled kernel and its bands must cover the worst shard.
    Built as the elementwise union of the per-chunk plans (near planes simply
    run with the far planes' wider tap loops)."""
    from gmpi_tpu.ops.pallas_warp import FusedBands, SplatPlan

    plan, adj = fused_plans_for_config(cfg, img_size=img_size,
                                       n_planes=n_planes, margin=margin)
    bands = [b for _, _, b in plan]
    union = FusedBands(
        d_x=max(b.d_x for b in bands),
        d_y=max(b.d_y for b in bands),
        by_pad=max(b.by_pad for b in bands),
        b_x=max(b.b_x for b in bands),
        b_x2=(0 if any(b.b_x2 == 0 for b in bands)
              else max(b.b_x2 for b in bands)),
    )
    adj = [SplatPlan(*a) for a in adj]
    splat = SplatPlan(n_ps=max(a.n_ps for a in adj), n_blocks=adj[0].n_blocks)
    return union, splat


def bands_for_config(cfg, img_size: Optional[int] = None, n_planes: Optional[int] = None):
    """(band_y, band_x) for an ``ExperimentConfig``, or None when the image is
    too small for tiling to pay off."""
    import dataclasses

    img = img_size or cfg.hparams.img_size
    if img < 128:
        return None
    planes = dataclasses.replace(cfg.planes, n_planes=n_planes or cfg.planes.n_planes)
    geom = dataclasses.replace(cfg, planes=planes).plane_geometry()
    return estimate_bands(geom, cfg.camera, cfg.fov_deg, img, img)

"""Lighting augmentation on MPI textures — jittable port of the reference
``LightRenderer`` (``gmpi/core/light_renderer.py:11-199``).

Pipeline: expected depth from alphas (same cumprod weights as the renderer),
Gaussian-blur the depth, back-project to a per-texel point cloud using the
last plane's xyz grid, finite-difference cross-product normals, sample a light
position on the pose sphere, Lambertian shading ``ka + kd * max(0, -n.l)``
with (ka, kd) linearly grown over ``n_grow_iters``, multiply into the MPI RGB
and clip to [0, 1].

Pure function of (mpi, step, rng) — the reference's stateful ``self.step``
counter becomes an explicit argument so the op stays jit-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gmpi_tpu.core import poses as poses_mod
from gmpi_tpu.core.renderer import COMPOSITE_EPS

EPS = 1e-8


@dataclasses.dataclass(frozen=True)
class LightingConfig:
    sphere_center_z: float
    sphere_r: float
    ka_max: float = 0.9
    kd_max: float = 0.1
    n_grow_iters: int = 1000
    l_h_mean: float = 0.0
    l_h_std: float = 0.2
    l_v_mean: float = 0.2
    l_v_std: float = 0.05
    blur_ksize: int = 9


def _gaussian_kernel1d(ksize: int) -> np.ndarray:
    """OpenCV-convention sigma from ksize (``light_renderer.py:52``)."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Separable Gaussian blur of [B, C, H, W] with reflect padding
    (torchvision GaussianBlur semantics)."""
    k = jnp.asarray(_gaussian_kernel1d(ksize))
    c = x.shape[1]
    pad = ksize // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    kh = jnp.broadcast_to(k.reshape(1, 1, ksize, 1), (c, 1, ksize, 1))
    kw = jnp.broadcast_to(k.reshape(1, 1, 1, ksize), (c, 1, 1, ksize))
    y = jax.lax.conv_general_dilated(
        xp, kh, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c
    )
    return jax.lax.conv_general_dilated(
        y, kw, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c
    )


def expected_depth(mpi_alpha: jnp.ndarray, plane_ds: jnp.ndarray) -> jnp.ndarray:
    """[B, L, 1, H, W] alphas + [L] depths -> [B, 1, H, W] expected depth
    (``light_renderer.py:82-100``)."""
    ones = jnp.ones_like(mpi_alpha[:, :1])
    shifted = jnp.concatenate([ones, 1.0 - mpi_alpha + COMPOSITE_EPS], axis=1)
    weights = mpi_alpha * jnp.cumprod(shifted, axis=1)[:, :-1]
    ds = plane_ds.reshape(1, -1, 1, 1, 1)
    return jnp.sum(weights * ds, axis=1)


def texel_point_cloud(
    mpi_alpha: jnp.ndarray, dhw: jnp.ndarray, xyz_last_plane: jnp.ndarray, blur_ksize: int
) -> jnp.ndarray:
    """Back-project blurred expected depth through the last plane's texel rays
    (``compute_pcl``, ``light_renderer.py:102-120``).  Returns [B, H, W, 3]."""
    depth = expected_depth(mpi_alpha, dhw[:, 0])
    depth = gaussian_blur(depth, blur_ksize)[:, 0]  # [B, H, W]
    scale = depth[..., None] / (xyz_last_plane[..., 2:] + EPS)
    return xyz_last_plane[None, ...] * scale if xyz_last_plane.ndim == 3 else xyz_last_plane * scale


def finite_difference_normals(grid_3d: jnp.ndarray) -> jnp.ndarray:
    """Cross-product normals from 4 neighbor triangles, replicate-padded and
    normalized (``get_normal``, ``light_renderer.py:57-80``).  [B, H, W, 3]."""
    center = grid_3d[:, 1:-1, 1:-1]
    up = grid_3d[:, :-2, 1:-1]
    down = grid_3d[:, 2:, 1:-1]
    left = grid_3d[:, 1:-1, :-2]
    right = grid_3d[:, 1:-1, 2:]
    n1 = jnp.cross(up - center, left - center)
    n2 = jnp.cross(left - center, down - center)
    n3 = jnp.cross(down - center, right - center)
    n4 = jnp.cross(right - center, up - center)
    normal = n1 + n2 + n3 + n4
    normal = jnp.pad(normal, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return normal / (jnp.sqrt(jnp.sum(normal**2, axis=3, keepdims=True)) + EPS)


def light_mpi(
    cfg: LightingConfig,
    mpi: jnp.ndarray,  # [B, L, 4, H, W] in [0, 1]
    dhw: jnp.ndarray,  # [L, 3]
    xyz_last_plane: jnp.ndarray,  # [H, W, 3] texel coords of the last plane
    step: jnp.ndarray,  # scalar int — growth schedule position
    rng: jax.Array,
) -> jnp.ndarray:
    """Apply the lighting augmentation; returns the re-lit MPI."""
    bs = mpi.shape[0]
    rgb = mpi[:, :, :3]
    alpha = mpi[:, :, 3:]

    grid_3d = texel_point_cloud(alpha, dhw, xyz_last_plane, cfg.blur_ksize)

    pose_cfg = poses_mod.SphereCameraConfig(
        sphere_center_z=cfg.sphere_center_z,
        sphere_r=cfg.sphere_r,
        yaw_mean=cfg.l_h_mean,
        yaw_std=cfg.l_h_std,
        pitch_mean=cfg.l_v_mean,
        pitch_std=cfg.l_v_std,
        n_truncated_stds=2.0,
        sample_method="truncated_gaussian",
    )
    c2w, _, _ = poses_mod.sample_sphere_poses(rng, bs, pose_cfg)
    light_pos = c2w[:, :3, 3]
    sphere_center = jnp.asarray([0.0, 0.0, cfg.sphere_center_z], jnp.float32)
    light_dir = sphere_center[None] - light_pos
    light_dir = light_dir / jnp.linalg.norm(light_dir, axis=-1, keepdims=True)

    normal = finite_difference_normals(grid_3d)  # [B, H, W, 3]
    diffuse = -jnp.sum(normal * light_dir.reshape(-1, 1, 1, 3), axis=3)
    diffuse = jnp.clip(diffuse, 0.0, None)[:, None, None]  # [B, 1, 1, H, W]

    ratio = jnp.minimum(1.0, step.astype(jnp.float32) / cfg.n_grow_iters)
    ka = ratio * cfg.ka_max
    kd = ratio * cfg.kd_max
    shading = ka + diffuse * kd

    new_rgb = jnp.clip(rgb * shading, 0.0, 1.0)
    return jnp.concatenate([new_rgb, alpha], axis=2)

"""Pinhole camera model — pure-function, jittable.

Replaces the stateful ``Camera`` class of the reference
(``gmpi/core/camera.py:13-211``) with functions over a tiny ``Intrinsics``
pytree.  World convention matches the reference MPI frame: **+X right,
+Y down, +Z forward** (``gmpi/core/mpi_renderer.py:120``).

All functions are shape-static and dtype-f32 so they trace cleanly under
``jax.jit``; ray grids are computed on device (no host caching needed — XLA
constant-folds them when the camera is static).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class Intrinsics(NamedTuple):
    """Pinhole intrinsics. ``K = [[f, 0, w/2], [0, f, h/2], [0, 0, 1]]``
    with focal from FOV: ``f = w / (2 tan(fov/2))``
    (reference: ``gmpi/utils/cam_utils.py:16-22``, ``mpi_renderer.py:86-101``).
    """

    focal: float
    height: int
    width: int


def intrinsics_from_fov(fov_deg: float, height: int, width: int) -> Intrinsics:
    """Focal length from field of view (``gmpi/core/mpi_renderer.py:86-89``)."""
    tan_half = math.tan(math.pi * fov_deg / (2.0 * 180.0))
    focal = width / (2.0 * tan_half)
    return Intrinsics(focal=focal, height=height, width=width)


def pixel_ray_dirs_cam(intr: Intrinsics, from_pixel_center: bool = True) -> jnp.ndarray:
    """Unit-length per-pixel ray directions in the *camera* frame.

    Returns ``[3, H, W]`` float32.  Matches the reference
    ``Camera.homogeneous_coordinates`` + normalization
    (``gmpi/core/camera.py:53-76, 98-105``): pixel grid (optionally +0.5 for
    pixel centers), unprojected by ``K^-1`` and L2-normalized.
    """
    h, w, f = intr.height, intr.width, intr.focal
    off = 0.5 if from_pixel_center else 0.0
    xs = (jnp.arange(w, dtype=jnp.float32) + off - w / 2.0) / f
    ys = (jnp.arange(h, dtype=jnp.float32) + off - h / 2.0) / f
    xx = jnp.broadcast_to(xs[None, :], (h, w))
    yy = jnp.broadcast_to(ys[:, None], (h, w))
    p = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=0)  # [3, H, W]
    norm = jnp.linalg.norm(p, axis=0, keepdims=True)
    return (p / norm).astype(jnp.float32)


def border_ray_dirs_cam(intr: Intrinsics) -> np.ndarray:
    """Unit ray directions through the four image corners ``(u,v) in {0,W}x{0,H}``
    — used only for frustum-bound fitting, host-side
    (``gmpi/core/camera.py:79-96``).  Returns ``[3, 4]`` float64 numpy.
    """
    h, w, f = intr.height, intr.width, intr.focal
    us = np.array([0.0, w, 0.0, w])
    vs = np.array([0.0, 0.0, h, h])
    p = np.stack([(us - w / 2.0) / f, (vs - h / 2.0) / f, np.ones(4)], axis=0)
    return p / np.linalg.norm(p, axis=0, keepdims=True)


def generate_rays(
    intr: Intrinsics,
    c2w: jnp.ndarray,
    from_pixel_center: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """World-space camera rays for a batch of camera-to-world transforms.

    Args:
        c2w: ``[..., 4, 4]`` camera-to-world transforms.

    Returns:
        ray_dir ``[..., 3, H, W]``, eye_pos ``[..., 3]``, z_dir ``[..., 3]``
        — semantics of ``Camera.generate_rays`` (``gmpi/core/camera.py:132-211``):
        rays rotated into world space, eye from the translation column, optical
        axis = third rotation column.
    """
    dirs_cam = pixel_ray_dirs_cam(intr, from_pixel_center)  # [3, H, W]
    rot = c2w[..., :3, :3]
    eye = c2w[..., :3, 3]
    z_dir = rot[..., :, 2]
    flat = dirs_cam.reshape(3, -1)
    ray_dir = jnp.einsum("...ij,jk->...ik", rot, flat, precision="highest")
    ray_dir = ray_dir.reshape(c2w.shape[:-2] + (3, intr.height, intr.width))
    return ray_dir, eye, z_dir

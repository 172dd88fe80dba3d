"""Fused Pallas warp+composite kernel vs the XLA renderer (interpret mode on
the CPU mesh; compiled-mode parity is exercised on TPU by the benchmark)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.core import poses as poses_mod
from gmpi_tpu.core.renderer import render_mpi
from gmpi_tpu.ops.pallas_render import render_mpi_fused_fwd
from gmpi_tpu.utils.toy_mpi import layered_scene


def _setup(n_views=2, n_planes=6, img=64, seed=0):
    geom = geom_mod.build_plane_geometry(
        n_planes=n_planes, min_d=0.95, max_d=1.12, fov_deg=12.6,
        sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
    )
    rng = np.random.default_rng(seed)
    rgba = jnp.asarray(rng.random((n_views, n_planes, 4, img, img)).astype(np.float32))
    yaws = jnp.linspace(-0.3, 0.3, n_views).reshape(-1, 1)
    pitches = jnp.linspace(-0.15, 0.15, n_views).reshape(-1, 1)
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, n_views, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=yaws, given_pitches=pitches,
    )
    intr = cam.intrinsics_from_fov(12.6, img, img)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    return geom, rgba, c2w, intr, ray_dir, eye, z_dir


def test_fused_kernel_matches_renderer():
    geom, rgba, c2w, intr, ray_dir, eye, z_dir = _setup()
    ref = render_mpi(rgba, geom.dhw, ray_dir, eye, z_dir)
    color, depth = render_mpi_fused_fwd(
        rgba, geom.dhw, c2w, z_dir, intr.focal, 64, 64,
        band_y=64, band_x=104, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth), rtol=1e-4, atol=1e-4)


def test_fused_kernel_toy_scene_occlusion():
    """Physics survives the fusion: near content occludes far."""
    geom, _, c2w, intr, ray_dir, eye, z_dir = _setup(n_views=1, n_planes=4)
    mpi = jnp.asarray(layered_scene(4, 64))[None]
    ref = render_mpi(mpi, geom.dhw, ray_dir[:1], eye[:1], z_dir[:1])
    color, depth = render_mpi_fused_fwd(
        mpi, geom.dhw, c2w[:1], z_dir[:1], intr.focal, 64, 64,
        band_y=64, band_x=104, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color), rtol=1e-4, atol=1e-4)

"""Multi-chip sharded renderer vs the single-device renderer, on the virtual
8-device CPU mesh (conftest forces ``xla_force_host_platform_device_count=8``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.core import poses as poses_mod
from gmpi_tpu.core.renderer import render_mpi
from gmpi_tpu.parallel.mesh import make_mesh
from gmpi_tpu.parallel.render import (
    render_mpi_plane_sharded,
    render_mpi_plane_tile_sharded,
    render_mpi_tile_sharded,
)

FFHQ_CAM = dict(
    fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
    yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
)


@pytest.fixture(scope="module")
def fixture():
    geom = geom_mod.build_plane_geometry(
        n_planes=8, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        enlarge_factor=1.001, confined=True, **FFHQ_CAM,
    )
    rng = np.random.default_rng(0)
    rgba = jnp.asarray(rng.random((2, 8, 4, 32, 32)).astype(np.float32))
    yaws = jnp.asarray([[-0.2], [0.2]], jnp.float32)
    pitches = jnp.asarray([[0.1], [-0.1]], jnp.float32)
    c2w = poses_mod.c2w_from_yaw_pitch(yaws, pitches, 1.0, 1.0)
    intr = cam.intrinsics_from_fov(12.6, 32, 32)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    ref = render_mpi(rgba, geom.dhw, ray_dir, eye, z_dir)
    return geom, rgba, ray_dir, eye, z_dir, ref


def test_tile_sharded_matches(fixture):
    geom, rgba, ray_dir, eye, z_dir, ref = fixture
    mesh = make_mesh([8], ("tile",))
    out = render_mpi_tile_sharded(mesh, rgba, geom.dhw, ray_dir, eye, z_dir)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth), rtol=1e-5, atol=1e-6)


def test_plane_sharded_matches(fixture):
    geom, rgba, ray_dir, eye, z_dir, ref = fixture
    mesh = make_mesh([8], ("plane",))
    out = render_mpi_plane_sharded(mesh, rgba, geom.dhw, ray_dir, eye, z_dir)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth), rtol=1e-5, atol=1e-6)


def test_plane_tile_sharded_matches(fixture):
    geom, rgba, ray_dir, eye, z_dir, ref = fixture
    mesh = make_mesh([4, 2], ("plane", "tile"))
    out = render_mpi_plane_tile_sharded(mesh, rgba, geom.dhw, ray_dir, eye, z_dir)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth), rtol=1e-5, atol=1e-6)


def test_plane_sharded_grads_match(fixture):
    """Gradients w.r.t. the sharded plane textures match the single-device
    renderer's — the sharded render is the *same function*."""
    geom, rgba, ray_dir, eye, z_dir, _ = fixture
    mesh = make_mesh([8], ("plane",))
    cot = jnp.asarray(np.random.default_rng(3).standard_normal((2, 3, 32, 32)).astype(np.float32))

    def loss_ref(x):
        return jnp.sum(render_mpi(x, geom.dhw, ray_dir, eye, z_dir).color * cot)

    def loss_sharded(x):
        return jnp.sum(render_mpi_plane_sharded(mesh, x, geom.dhw, ray_dir, eye, z_dir).color * cot)

    g_ref = jax.grad(loss_ref)(rgba)
    # NB: grad-of-shard_map requires jit (eager transpose trips an XLA
    # sharding-override assert in current JAX)
    g_sh = jax.jit(jax.grad(loss_sharded))(rgba)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref), rtol=1e-4, atol=1e-4)

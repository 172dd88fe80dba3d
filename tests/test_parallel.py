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


@pytest.mark.slow
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


@pytest.mark.slow
def test_tile_sharded_with_bands_matches():
    """Production banded-MXU warp through the tile-sharded path (VERDICT:
    the sharded renderer must use the production kernel)."""
    from gmpi_tpu.core.renderer import homography_grid
    from gmpi_tpu.ops.tiled_warp import required_bands

    geom = geom_mod.build_plane_geometry(
        n_planes=8, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        enlarge_factor=1.001, confined=True, **FFHQ_CAM,
    )
    rng = np.random.default_rng(1)
    rgba = jnp.asarray(rng.random((1, 8, 4, 128, 128)).astype(np.float32))
    c2w = poses_mod.c2w_from_yaw_pitch(
        jnp.asarray([[0.15]]), jnp.asarray([[0.05]]), 1.0, 1.0)
    intr = cam.intrinsics_from_fov(12.6, 128, 128)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)

    ray_f = jnp.broadcast_to(ray_dir[:, None], (1, 8, 3, 128, 128)).reshape(8, 3, 128, 128)
    eye_f = jnp.broadcast_to(eye[:, None], (1, 8, 3)).reshape(8, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (1, 8, 3)).reshape(8, 3)
    grid, _ = homography_grid(jnp.asarray(geom.dhw), eye_f, ray_f, z_f)
    bands = required_bands((8, 4, 128, 128), grid)

    ref = render_mpi(rgba, geom.dhw, ray_dir, eye, z_dir, tiled_bands=bands)
    mesh = make_mesh([8], ("tile",))
    out = render_mpi_tile_sharded(mesh, rgba, geom.dhw, ray_dir, eye, z_dir,
                                  tiled_bands=bands)
    np.testing.assert_array_equal(np.asarray(out.color), np.asarray(ref.color))

    mesh2 = make_mesh([2, 4], ("plane", "tile"))
    out2 = render_mpi_plane_tile_sharded(mesh2, rgba, geom.dhw, ray_dir, eye,
                                         z_dir, tiled_bands=bands)
    np.testing.assert_allclose(np.asarray(out2.color), np.asarray(ref.color),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_plane_sharded_fused_slab_matches_and_grads():
    """The fused Pallas slab renderer (interpret mode on the CPU mesh)
    through the plane-sharded path: forward and gradients match the
    single-device fused render."""
    from gmpi_tpu.core.renderer import plan_fused, render_mpi_fused
    from gmpi_tpu.ops.pallas_warp import make_fused_slab_renderer

    L, res = 4, 256
    geom = geom_mod.build_plane_geometry(
        n_planes=L, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        enlarge_factor=1.001, confined=True, **FFHQ_CAM,
    )
    rng = np.random.default_rng(2)
    rgba = jnp.asarray(rng.random((1, L, 4, res, res)).astype(np.float32))
    c2w = poses_mod.c2w_from_yaw_pitch(
        jnp.asarray([[0.1]]), jnp.asarray([[0.05]]), 1.0, 1.0)
    intr = cam.intrinsics_from_fov(12.6, res, res)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    dhw = jnp.asarray(geom.dhw)

    # single-chunk plan: union bands shared by every shard (SPMD statics)
    plans = plan_fused(dhw, ray_dir, eye, z_dir, res, res)
    (lo, hi, bands) = plans[0][0]
    if len(plans[0]) > 1:
        import numpy as _np
        from gmpi_tpu.ops.pallas_warp import FusedBands
        bands = FusedBands(*[max(b[i] for _, _, b in plans[0]) for i in range(4)])
    splat = plans[1][0]
    import gmpi_tpu.ops.pallas_warp as pw
    splat = pw.SplatPlan(max(s.n_ps for s in plans[1]),
                         max(s.n_blocks for s in plans[1]))

    slab_fn = make_fused_slab_renderer(tuple(bands), tuple(splat), res, res,
                                       interpret=True)
    cot = jnp.asarray(rng.standard_normal((1, 3, res, res)).astype(np.float32))

    fn_single = pw.make_fused_renderer(
        tuple((0, L, tuple(bands)) for _ in [0]), (tuple(splat),), res, res,
        early_out=False, interpret=True)

    def loss_single(x):
        c, d, t = fn_single(x, dhw, ray_dir, eye, z_dir)
        return jnp.sum(c * cot)

    mesh = make_mesh([2], ("plane",), devices=jax.devices()[:2])

    def loss_sharded(x):
        out = render_mpi_plane_sharded(mesh, x, dhw, ray_dir, eye, z_dir,
                                       slab_fn=slab_fn)
        return jnp.sum(out.color * cot)

    ref = float(loss_single(rgba))
    got = float(loss_sharded(rgba))
    assert abs(ref - got) / abs(ref) < 1e-5, (ref, got)
    g_ref = jax.grad(loss_single)(rgba)
    g_got = jax.grad(loss_sharded)(rgba)
    err = float(jnp.max(jnp.abs(g_ref - g_got)))
    scale = float(jnp.max(jnp.abs(g_ref)))
    assert err / scale < 1e-4, (err, scale)


def test_plane_sharded_pipelined_matches_and_grads():
    """The pipelined plane-shard combine (VERDICT r2 #6) is the same function
    as the single-device renderer: forward and texture gradients match on the
    8-device CPU mesh, for several sub-slab depths."""
    from gmpi_tpu.parallel.render import render_mpi_plane_sharded_pipelined

    geom = geom_mod.build_plane_geometry(
        n_planes=16, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        enlarge_factor=1.001, confined=True, **FFHQ_CAM,
    )
    rng = np.random.default_rng(0)
    rgba = jnp.asarray(rng.random((2, 16, 4, 32, 32)).astype(np.float32))
    yaws = jnp.asarray([[-0.2], [0.2]], jnp.float32)
    pitches = jnp.asarray([[0.1], [-0.1]], jnp.float32)
    c2w = poses_mod.c2w_from_yaw_pitch(yaws, pitches, 1.0, 1.0)
    intr = cam.intrinsics_from_fov(12.6, 32, 32)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    ref = render_mpi(rgba, geom.dhw, ray_dir, eye, z_dir)
    cot = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))

    def loss_ref(x):
        return jnp.sum(render_mpi(x, geom.dhw, ray_dir, eye, z_dir).color * cot)

    g_ref = jax.grad(loss_ref)(rgba)

    mesh = make_mesh([8], ("plane",))
    for n_sub in (1, 2):
        out = jax.jit(lambda x: render_mpi_plane_sharded_pipelined(
            mesh, x, geom.dhw, ray_dir, eye, z_dir, n_sub=n_sub))(rgba)
        np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth),
                                   rtol=1e-5, atol=1e-6)

        def loss_pipe(x, ns=n_sub):
            return jnp.sum(render_mpi_plane_sharded_pipelined(
                mesh, x, geom.dhw, ray_dir, eye, z_dir, n_sub=ns).color * cot)

        g_pipe = jax.jit(jax.grad(loss_pipe))(rgba)
        np.testing.assert_allclose(np.asarray(g_pipe), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)

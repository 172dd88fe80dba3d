"""Expected-disparity parity through every fast path (VERDICT r4 #6).

The reference renderer always returns expected disparity
``sum_l w_l / depth_l`` (``gmpi/core/mpi.py:429-434``).  The gather path
(:func:`render_mpi`) is the oracle; these tests pin the fused Pallas kernel
(interpret mode), the chunked scan, the remat slab chain, and the sharded
paths against it — forward AND cotangent (gradients through a
disp-dependent loss).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import geometry, poses
from gmpi_tpu.core.poses import SphereCameraConfig
from gmpi_tpu.core.renderer import (plan_fused, render_mpi, render_mpi_chunked,
                                    render_mpi_fused, render_mpi_fused_remat)

L, T, H = 8, 64, 128
CAM = SphereCameraConfig(sphere_center_z=1.0, sphere_r=1.0,
                         yaw_mean=0.0, yaw_std=0.2, pitch_mean=0.0,
                         pitch_std=0.1)


def _setup():
    geom = geometry.build_plane_geometry(
        n_planes=L, min_d=0.95, max_d=1.12, fov_deg=12.6,
        sphere_center_z=1.0, sphere_r=1.0, yaw_mean=0.0, yaw_std=0.2,
        pitch_mean=0.0, pitch_std=0.1)
    rng = np.random.default_rng(3)
    rgba = jnp.asarray(rng.random((2, L, 4, T, T)).astype(np.float32))
    c2w, _, _ = poses.sample_sphere_poses(
        None, 2, CAM, given_yaws=jnp.array([0.08, -0.15]),
        given_pitches=jnp.array([0.03, -0.06]))
    intr = cam.intrinsics_from_fov(12.6, H, H)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    return geom, rgba, ray_dir, eye, z_dir


def _close(a, b, tol, what=""):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.abs(a).max(), np.abs(b).max(), 1e-8)
    err = np.abs(a - b).max() / scale
    assert err < tol, (what, err, scale)


def _disp_loss(render):
    def loss(x):
        o = render(x)
        return (jnp.sum(jnp.sin(3.0 * o.color)) + 0.5 * jnp.sum(o.disp ** 2)
                + 0.2 * jnp.sum(o.depth))
    return loss


def test_fused_disp_fwd_and_grad():
    geom, rgba, ray_dir, eye, z_dir = _setup()
    plans = plan_fused(geom.dhw, ray_dir, eye, z_dir, T, T)

    def fused(x):
        return render_mpi_fused(x, geom.dhw, ray_dir, eye, z_dir, plans,
                                interpret=True, with_disp=True)

    def oracle(x):
        return render_mpi(x, geom.dhw, ray_dir, eye, z_dir, True)

    o_f, o_o = fused(rgba), oracle(rgba)
    assert o_f.disp is not None
    _close(o_f.disp, o_o.disp, 5e-5, "fused disp fwd")
    g_f = jax.grad(_disp_loss(fused))(rgba)
    g_o = jax.grad(_disp_loss(oracle))(rgba)
    _close(g_f, g_o, 5e-4, "fused disp grad")


def test_fused_remat_disp():
    geom, rgba, ray_dir, eye, z_dir = _setup()
    plans = plan_fused(geom.dhw, ray_dir, eye, z_dir, T, T)

    def remat(x):
        return render_mpi_fused_remat(x, geom.dhw, ray_dir, eye, z_dir, plans,
                                      interpret=True, with_disp=True)

    def oracle(x):
        return render_mpi(x, geom.dhw, ray_dir, eye, z_dir, True)

    _close(remat(rgba).disp, oracle(rgba).disp, 5e-5, "remat disp fwd")
    g_f = jax.grad(_disp_loss(remat))(rgba)
    g_o = jax.grad(_disp_loss(oracle))(rgba)
    _close(g_f, g_o, 5e-4, "remat disp grad")


def test_chunked_disp_fwd_and_grad():
    geom, rgba, ray_dir, eye, z_dir = _setup()

    def chunked(x):
        return render_mpi_chunked(x, geom.dhw, ray_dir, eye, z_dir,
                                  plane_chunk=4, with_disp=True)

    def oracle(x):
        return render_mpi(x, geom.dhw, ray_dir, eye, z_dir, True)

    _close(chunked(rgba).disp, oracle(rgba).disp, 5e-5, "chunked disp fwd")
    g_c = jax.grad(_disp_loss(chunked))(rgba)
    g_o = jax.grad(_disp_loss(oracle))(rgba)
    _close(g_c, g_o, 1e-4, "chunked disp grad")


@pytest.mark.parametrize("fn_name", ["plane", "plane_tile", "tile"])
def test_sharded_disp(fn_name):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from gmpi_tpu.parallel.mesh import make_mesh
    from gmpi_tpu.parallel import render as pr

    geom, rgba, ray_dir, eye, z_dir = _setup()
    if fn_name == "plane":
        mesh = make_mesh([8], ("plane",))
        render = lambda x: pr.render_mpi_plane_sharded(
            mesh, x, geom.dhw, ray_dir, eye, z_dir, with_disp=True)
    elif fn_name == "plane_tile":
        mesh = make_mesh([4, 2], ("plane", "tile"))
        render = lambda x: pr.render_mpi_plane_tile_sharded(
            mesh, x, geom.dhw, ray_dir, eye, z_dir, with_disp=True)
    else:
        mesh = make_mesh([8], ("tile",))
        render = lambda x: pr.render_mpi_tile_sharded(
            mesh, x, geom.dhw, ray_dir, eye, z_dir, with_disp=True)

    def oracle(x):
        return render_mpi(x, geom.dhw, ray_dir, eye, z_dir, True)

    out = jax.jit(render)(rgba)
    assert out.disp is not None
    _close(out.disp, oracle(rgba).disp, 5e-5, f"{fn_name} disp fwd")
    g_s = jax.jit(jax.grad(_disp_loss(render)))(rgba)
    g_o = jax.grad(_disp_loss(oracle))(rgba)
    _close(g_s, g_o, 1e-4, f"{fn_name} disp grad")


def test_fused_slab_disp_partials_combine():
    from gmpi_tpu.core.renderer import combine_segments
    from gmpi_tpu.ops.pallas_warp import SplatPlan, make_fused_slab_renderer

    geom, rgba, ray_dir, eye, z_dir = _setup()
    plans = plan_fused(geom.dhw, ray_dir, eye, z_dir, T, T)
    plan, adj = plans
    carry = None
    for (lo, hi, bands), spl in zip(plan, adj):
        fn = make_fused_slab_renderer(tuple(bands), tuple(spl), T, T,
                                      interpret=True, with_disp=True)
        part = fn(rgba[:, lo:hi], geom.dhw[lo:hi], ray_dir, eye, z_dir)
        assert len(part) == 4
        carry = part if carry is None else combine_segments(carry, part)
    color, depth, disp, _ = carry
    o = render_mpi(rgba, geom.dhw, ray_dir, eye, z_dir, True)
    _close(color, o.color, 5e-5, "slab color")
    _close(disp, o.disp, 5e-5, "slab disp")

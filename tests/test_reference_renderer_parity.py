"""THE allclose bar: our renderer vs the reference implementation itself.

Runs ``gmpi.core.mpi.MPI.forward`` (torch, CPU, imported read-only from
/root/reference) on identical inputs and requires our ``render_mpi`` — in
both the gather and the tile-banded MXU formulations — to match its color,
depth, and d/d(RGBA) gradients.  This is BASELINE's "bit-accurate (allclose)
vs reference render + pixel grads" criterion, exercised directly rather than
through re-derived oracles.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.core import poses as poses_mod
from gmpi_tpu.core.renderer import render_mpi
from gmpi_tpu.ops.tiled_warp import required_bands
from gmpi_tpu.ops.tiled_warp_adjoint import required_output_bands
from tests._reference import import_reference, reference_available

needs_reference = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


def _fixture(n_views=3, n_planes=8, tex=64, img=48, seed=0):
    geom = geom_mod.build_plane_geometry(
        n_planes=n_planes, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
    )
    rng = np.random.default_rng(seed)
    rgba = rng.random((n_views, n_planes, 4, tex, tex)).astype(np.float32)
    yaws = np.linspace(-0.4, 0.4, n_views).astype(np.float32).reshape(-1, 1)
    pitches = np.linspace(-0.2, 0.2, n_views).astype(np.float32).reshape(-1, 1)
    c2w = poses_mod.c2w_from_yaw_pitch(jnp.asarray(yaws), jnp.asarray(pitches), 1.0, 1.0)
    intr = cam.intrinsics_from_fov(12.6, img, img)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    return geom, rgba, ray_dir, eye, z_dir


def _reference_render(rgba_t, dhw_t, ray_dir, eye, z_dir):
    """One camera per MPI through the reference ``MPI.forward``."""
    import torch

    mpi_mod = import_reference("gmpi.core.mpi")
    renderer = mpi_mod.MPI(align_corners=True)
    v = rgba_t.shape[0]
    t = lambda a: torch.from_numpy(np.asarray(a))
    color, depth = renderer(
        batch_rgba=rgba_t,
        batch_dhw=t(dhw_t).unsqueeze(0).expand(v, -1, -1),
        batch_ray_dir=[t(ray_dir[i : i + 1]) for i in range(v)],
        batch_eye_pos=[t(eye[i : i + 1]) for i in range(v)],
        batch_z_dir=[t(z_dir[i : i + 1]) for i in range(v)],
        separate_background=None,
    )
    return color, depth


@needs_reference
def test_forward_allclose_vs_reference_implementation():
    import torch

    geom, rgba, ray_dir, eye, z_dir = _fixture()
    color_ref, depth_ref = _reference_render(
        torch.from_numpy(rgba), geom.dhw, ray_dir, eye, z_dir
    )

    out = render_mpi(jnp.asarray(rgba), geom.dhw, ray_dir, eye, z_dir)
    np.testing.assert_allclose(np.asarray(out.color), color_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), depth_ref.numpy(), rtol=1e-4, atol=1e-5)


@needs_reference
def test_tiled_forward_allclose_vs_reference_implementation():
    import torch

    geom, rgba, ray_dir, eye, z_dir = _fixture(tex=64, img=64)
    color_ref, _ = _reference_render(torch.from_numpy(rgba), geom.dhw, ray_dir, eye, z_dir)

    # compute exact bands for this pose set, as production setup does
    from gmpi_tpu.core.renderer import homography_grid

    v, l = rgba.shape[0], rgba.shape[1]
    dhw_f = jnp.broadcast_to(geom.dhw[None], (v, l, 3)).reshape(v * l, 3)
    ray_f = jnp.broadcast_to(ray_dir[:, None], (v, l, 3, 64, 64)).reshape(v * l, 3, 64, 64)
    eye_f = jnp.broadcast_to(eye[:, None], (v, l, 3)).reshape(v * l, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (v, l, 3)).reshape(v * l, 3)
    grid, _ = homography_grid(dhw_f, eye_f, ray_f, z_f)
    by, bx = required_bands((v * l, 4, 64, 64), grid, tile=(8, 64))

    out = render_mpi(jnp.asarray(rgba), geom.dhw, ray_dir, eye, z_dir, tiled_bands=(by, bx))
    np.testing.assert_allclose(np.asarray(out.color), color_ref.numpy(), rtol=1e-4, atol=1e-5)


@needs_reference
def test_gradients_allclose_vs_reference_implementation():
    import torch

    geom, rgba, ray_dir, eye, z_dir = _fixture(n_views=2, n_planes=6, tex=32, img=32)
    rng = np.random.default_rng(7)
    cot_c = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    cot_d = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)

    rgba_t = torch.from_numpy(rgba).requires_grad_(True)
    color_ref, depth_ref = _reference_render(rgba_t, geom.dhw, ray_dir, eye, z_dir)
    (color_ref * torch.from_numpy(cot_c)).sum().add_(
        (depth_ref * torch.from_numpy(cot_d)).sum()
    ).backward()
    grad_ref = rgba_t.grad.numpy()

    # gather formulation
    def loss(x):
        out = render_mpi(x, geom.dhw, ray_dir, eye, z_dir)
        return jnp.sum(out.color * cot_c) + jnp.sum(out.depth * cot_d)

    g = np.asarray(jax.grad(loss)(jnp.asarray(rgba)))
    np.testing.assert_allclose(g, grad_ref, rtol=1e-4, atol=1e-5)

    # tiled formulation with the scatter-free adjoint VJP
    from gmpi_tpu.core.renderer import homography_grid

    v, l = 2, 6
    dhw_f = jnp.broadcast_to(geom.dhw[None], (v, l, 3)).reshape(v * l, 3)
    ray_f = jnp.broadcast_to(ray_dir[:, None], (v, l, 3, 32, 32)).reshape(v * l, 3, 32, 32)
    eye_f = jnp.broadcast_to(eye[:, None], (v, l, 3)).reshape(v * l, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (v, l, 3)).reshape(v * l, 3)
    grid, _ = homography_grid(dhw_f, eye_f, ray_f, z_f)
    by, bx = required_bands((v * l, 4, 32, 32), grid, tile=(8, 32))
    pbr, pbc = required_output_bands((v * l, 4, 32, 32), grid, tile=(8, 32))

    from gmpi_tpu.ops.tiled_warp import make_tiled_warp_with_adjoint
    from gmpi_tpu.core.renderer import composite
    from jax import lax

    warp = make_tiled_warp_with_adjoint(by, bx, (pbr, pbc), tile=(8, 32), adjoint_tile=(8, 32))

    def loss_tiled(x):
        flat = x.reshape(v * l, 4, 32, 32)
        sampled = warp(flat, lax.stop_gradient(grid))
        # reproduce render_mpi's depth path
        from gmpi_tpu.core.renderer import homography_grid as hg

        _, depth = hg(dhw_f, eye_f, ray_f, z_f)
        depth = lax.stop_gradient(1.0 / (1.0 / depth))
        rgb = sampled[:, :3].reshape(v, l, 3, 32, 32)
        alpha = sampled[:, 3:4].reshape(v, l, 1, 32, 32)
        d = depth.reshape(v, l, 1, 32, 32)
        c, dout = composite(rgb, alpha, d)
        return jnp.sum(c * cot_c) + jnp.sum(dout * cot_d)

    g2 = np.asarray(jax.grad(loss_tiled)(jnp.asarray(rgba)))
    np.testing.assert_allclose(g2, grad_ref, rtol=1e-4, atol=1e-4)


@needs_reference
def test_align_corners_false_allclose_vs_reference_implementation():
    """The 0.95 narrow-scale path (``gmpi/core/mpi.py:15-23,86-99``)."""
    import torch

    mpi_mod = import_reference("gmpi.core.mpi")
    geom, rgba, ray_dir, eye, z_dir = _fixture()
    renderer = mpi_mod.MPI(align_corners=False)
    v = rgba.shape[0]
    t = lambda a: torch.from_numpy(np.asarray(a))
    color_ref, depth_ref = renderer(
        batch_rgba=torch.from_numpy(rgba),
        batch_dhw=t(geom.dhw).unsqueeze(0).expand(v, -1, -1),
        batch_ray_dir=[t(ray_dir[i : i + 1]) for i in range(v)],
        batch_eye_pos=[t(eye[i : i + 1]) for i in range(v)],
        batch_z_dir=[t(z_dir[i : i + 1]) for i in range(v)],
        separate_background=None,
    )

    out = render_mpi(jnp.asarray(rgba), geom.dhw, ray_dir, eye, z_dir, align_corners=False)
    np.testing.assert_allclose(np.asarray(out.color), color_ref.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), depth_ref.numpy(), rtol=1e-4, atol=1e-5)


@needs_reference
def test_disparity_allclose_vs_reference_implementation():
    """Expected disparity ``sum_l w_l * disp_l``: the reference computes
    ``disp_out`` with the same composite weights (``gmpi/core/mpi.py:415-431``)
    but drops it at the return; recompute it in torch from the reference's own
    ``homography`` outputs and require our ``RenderOutput.disp`` to match."""
    import torch

    mpi_mod = import_reference("gmpi.core.mpi")
    geom, rgba, ray_dir, eye, z_dir = _fixture()
    v, l = rgba.shape[0], rgba.shape[1]
    img = ray_dir.shape[2]
    t = lambda a: torch.from_numpy(np.asarray(a))

    flat_rgba = t(rgba).reshape(v * l, 4, rgba.shape[3], rgba.shape[4])
    flat_dhw = t(geom.dhw)[None].expand(v, -1, -1).reshape(v * l, 3)
    flat_ray = t(ray_dir)[:, None].expand(-1, l, -1, -1, -1).reshape(v * l, 3, img, img)
    flat_eye = t(eye)[:, None].expand(-1, l, -1).reshape(v * l, 3)
    flat_z = t(z_dir)[:, None].expand(-1, l, -1).reshape(v * l, 3)
    _, flat_disp, flat_alpha = mpi_mod.homography(
        flat_rgba, flat_dhw, flat_eye, flat_ray, flat_z,
        assert_not_out_of_plane=False, align_corners=True)
    cat_alpha = flat_alpha.reshape(v, l, 1, img, img)
    cat_disp = flat_disp.reshape(v, l, 1, img, img)
    shifted = torch.cat([torch.ones_like(cat_alpha[:, :1]), 1 - cat_alpha + 1e-10], 1)
    weights = cat_alpha * torch.cumprod(shifted, dim=1)[:, :-1]
    disp_ref = torch.sum(weights * cat_disp, dim=1)

    out = render_mpi(jnp.asarray(rgba), geom.dhw, ray_dir, eye, z_dir)
    assert out.disp is not None
    np.testing.assert_allclose(np.asarray(out.disp), disp_ref.numpy(), rtol=1e-4, atol=1e-5)

"""MPI renderer vs a torch oracle (forward + gradients), plus internal
consistency of the chunked/segment-compositing paths.

The oracle re-expresses the published MPI rendering math — ray–plane
intersection, UV normalization, bilinear warp via ``F.grid_sample``,
front-to-back over-compositing with ``w = a * cumprod(1 - a + 1e-10)`` —
with torch primitives (matching ``gmpi/core/mpi.py`` semantics).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.core import poses as poses_mod
from gmpi_tpu.core.renderer import (
    check_rays_hit_last_plane,
    combine_segments,
    render_mpi,
    render_mpi_chunked,
    render_slab_partial,
)

FFHQ_CAM = dict(
    fov_deg=12.6,
    sphere_center_z=1.0,
    sphere_r=1.0,
    yaw_mean=0.0,
    yaw_std=0.289,
    pitch_mean=0.0,
    pitch_std=0.127,
    n_truncated_stds=2.0,
)


def build_fixture(n_planes=8, tex=64, img=48, n_views=3, seed=0):
    geom = geom_mod.build_plane_geometry(
        n_planes=n_planes,
        min_d=0.95,
        max_d=1.12,
        distance_sample_method="inverse",
        enlarge_factor=1.001,
        confined=True,
        **FFHQ_CAM,
    )
    rng = np.random.default_rng(seed)
    rgba = rng.random((n_views, n_planes, 4, tex, tex)).astype(np.float32)
    yaws = np.linspace(-0.3, 0.3, n_views).astype(np.float32).reshape(-1, 1)
    pitches = np.linspace(-0.15, 0.15, n_views).astype(np.float32).reshape(-1, 1)
    c2w = poses_mod.c2w_from_yaw_pitch(jnp.asarray(yaws), jnp.asarray(pitches), 1.0, 1.0)
    intr = cam.intrinsics_from_fov(12.6, img, img)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    return geom, rgba, ray_dir, eye, z_dir


def torch_reference_render(rgba, dhw, ray_dir, eye, z_dir, align_corners=True):
    """Oracle: MPI render via torch ops, plane 0 nearest."""
    V, L = rgba.shape[:2]
    H, W = ray_dir.shape[-2:]
    d = dhw[:, 0].view(1, L, 1, 1)
    height = dhw[:, 1].view(1, L, 1, 1)
    width = dhw[:, 2].view(1, L, 1, 1)
    with torch.no_grad():
        z_eye = eye[:, 2].view(V, 1, 1, 1)
        z_ray = ray_dir[:, 2].unsqueeze(1)  # [V,1,H,W]
        scale = (d - z_eye) / z_ray  # [V,L,H,W]
        x = eye[:, 0].view(V, 1, 1, 1) + ray_dir[:, 0].unsqueeze(1) * scale
        y = eye[:, 1].view(V, 1, 1, 1) + ray_dir[:, 1].unsqueeze(1) * scale
        u = 2 * x / width
        v = 2 * y / height
        if not align_corners:
            m = (u >= -1) & (u <= 1)
            u = torch.where(m, u * 0.95, u)
            m = (v >= -1) & (v <= 1)
            v = torch.where(m, v * 0.95, v)
        grid = torch.stack([u, v], dim=-1).reshape(V * L, H, W, 2)
        dist2depth = torch.einsum("vchw,vc->vhw", ray_dir, z_dir).unsqueeze(1)
        depth = scale * dist2depth  # [V,L,H,W]
        disp = 1.0 / depth
        depth = 1.0 / disp
    samp = F.grid_sample(
        rgba.reshape(V * L, 4, *rgba.shape[-2:]),
        grid,
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    ).reshape(V, L, 4, H, W)
    rgb, alpha = samp[:, :, :3], samp[:, :, 3:4]
    shifted = torch.cat([torch.ones_like(alpha[:, :1]), 1 - alpha + 1e-10], dim=1)
    weights = alpha * torch.cumprod(shifted, dim=1)[:, :-1]
    color = (weights * rgb).sum(1)
    depth_out = (weights * depth.unsqueeze(2)).sum(1)
    return color, depth_out


@pytest.mark.parametrize("align_corners", [True, False])
def test_forward_matches_torch(align_corners):
    geom, rgba, ray_dir, eye, z_dir = build_fixture()
    out = render_mpi(jnp.asarray(rgba), geom.dhw, ray_dir, eye, z_dir, align_corners)

    t = lambda a: torch.from_numpy(np.asarray(a))
    want_c, want_d = torch_reference_render(
        t(rgba), t(geom.dhw), t(ray_dir), t(eye), t(z_dir), align_corners
    )
    np.testing.assert_allclose(np.asarray(out.color), want_c.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), want_d.numpy(), rtol=1e-4, atol=1e-5)


def test_grad_matches_torch():
    geom, rgba, ray_dir, eye, z_dir = build_fixture(n_planes=6, tex=32, img=24, n_views=2)
    rng = np.random.default_rng(7)
    cot_c = rng.standard_normal((2, 3, 24, 24)).astype(np.float32)
    cot_d = rng.standard_normal((2, 1, 24, 24)).astype(np.float32)

    t_rgba = torch.from_numpy(rgba).requires_grad_(True)
    t = lambda a: torch.from_numpy(np.asarray(a))
    c, d = torch_reference_render(t_rgba, t(geom.dhw), t(ray_dir), t(eye), t(z_dir))
    (c * torch.from_numpy(cot_c)).sum().add_((d * torch.from_numpy(cot_d)).sum()).backward()
    want = t_rgba.grad.numpy()

    def loss(x):
        out = render_mpi(x, geom.dhw, ray_dir, eye, z_dir)
        return jnp.sum(out.color * cot_c) + jnp.sum(out.depth * cot_d)

    got = np.asarray(jax.grad(loss)(jnp.asarray(rgba)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_chunked_matches_full():
    geom, rgba, ray_dir, eye, z_dir = build_fixture(n_planes=8)
    full = render_mpi(jnp.asarray(rgba), geom.dhw, ray_dir, eye, z_dir)
    chunked = render_mpi_chunked(jnp.asarray(rgba), geom.dhw, ray_dir, eye, z_dir, plane_chunk=2)
    np.testing.assert_allclose(np.asarray(chunked.color), np.asarray(full.color), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(chunked.depth), np.asarray(full.depth), rtol=1e-4, atol=1e-5)


def test_segment_compositing_associative():
    geom, rgba, ray_dir, eye, z_dir = build_fixture(n_planes=8)
    rgba = jnp.asarray(rgba)
    full = render_mpi(rgba, geom.dhw, ray_dir, eye, z_dir)
    dhw = jnp.broadcast_to(geom.dhw[None], (rgba.shape[0], 8, 3))
    front = render_slab_partial(rgba[:, :3], dhw[:, :3], ray_dir, eye, z_dir)
    back = render_slab_partial(rgba[:, 3:], dhw[:, 3:], ray_dir, eye, z_dir)
    color, depth, _ = combine_segments(front, back)
    np.testing.assert_allclose(np.asarray(color), np.asarray(full.color), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(full.depth), rtol=1e-4, atol=1e-5)


def test_rays_hit_last_plane():
    geom, rgba, ray_dir, eye, z_dir = build_fixture()
    dhw_last = jnp.broadcast_to(geom.dhw[-1][None], (ray_dir.shape[0], 3))
    assert check_rays_hit_last_plane(dhw_last, eye, ray_dir, z_dir)


def test_sequential_compositor_matches_vectorized():
    """The back-to-front sequential compositor (the reference's
    ``MPI.old_forward`` cross-check) agrees with the cumprod form."""
    from gmpi_tpu.core.renderer import composite, composite_sequential

    rng = np.random.default_rng(11)
    rgb = jnp.asarray(rng.random((2, 6, 3, 16, 16)).astype(np.float32))
    alpha = jnp.asarray(rng.random((2, 6, 1, 16, 16)).astype(np.float32))
    depth = jnp.asarray(rng.random((2, 6, 1, 16, 16)).astype(np.float32) + 1.0)
    c1, d1 = composite(rgb, alpha, depth)
    c2, d2 = composite_sequential(rgb, alpha, depth)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d1), rtol=1e-4, atol=1e-5)


def test_differentiable_pose_gradients():
    """stop_pose_grad=False: gradients flow to the camera (eye position),
    matching finite differences — the BASELINE d-pose extension."""
    from gmpi_tpu.core.renderer import render_mpi as _render

    geom, _, ray_dir, eye, z_dir = build_fixture(n_planes=4, tex=32, img=24, n_views=1)
    # smooth texture: bilinear sampling is piecewise linear, so finite
    # differences only match autodiff away from texel-boundary kinks —
    # low-frequency content keeps the comparison well-posed
    yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32), indexing="ij")
    smooth = np.stack([np.sin(2 * yy + 1), np.cos(3 * xx), yy * xx, 0.5 + 0.4 * np.sin(xx + yy)], 0)
    rgba = jnp.asarray(np.tile(smooth[None, None], (1, 4, 1, 1, 1)).astype(np.float32) * 0.5 + 0.25)
    cot = jnp.asarray(np.random.default_rng(3).standard_normal((1, 3, 24, 24)).astype(np.float32))

    def loss(eye_x):
        e = eye.at[0, 0].add(eye_x)
        out = _render(rgba, geom.dhw, ray_dir, e, z_dir, stop_pose_grad=False)
        return jnp.sum(out.color * cot)

    g = float(jax.grad(loss)(0.0))
    assert g != 0.0
    # bilinear sampling is piecewise linear in position: finite differences
    # approach the point derivative only once the probe stays near one linear
    # piece (fp32 cancellation limits how small eps can go)
    eps = 1e-4
    fd = (float(loss(eps)) - float(loss(-eps))) / (2 * eps)
    assert np.sign(fd) == np.sign(g)
    np.testing.assert_allclose(g, fd, rtol=0.35)

    # default path: pose gradients are cut (reference semantics)
    def loss_stopped(eye_x):
        e = eye.at[0, 0].add(eye_x)
        out = _render(rgba, geom.dhw, ray_dir, e, z_dir)
        return jnp.sum(out.color * cot)

    assert float(jax.grad(loss_stopped)(0.0)) == 0.0


def test_differentiable_pose_gradients_tiled_path():
    """stop_pose_grad=False through the tile-banded MXU warp: with
    ``tiled_bands`` given, the differentiable-pose mode drops the custom
    adjoint (which cuts grid cotangents) and uses the plain-autodiff banded
    warp — pose gradients must match the gather path's (VERDICT r4 #7)."""
    from gmpi_tpu.core.renderer import render_mpi as _render
    from gmpi_tpu.ops.tiled_warp import required_bands

    geom, _, ray_dir, eye, z_dir = build_fixture(n_planes=4, tex=128, img=128,
                                                 n_views=1)
    yy, xx = np.meshgrid(np.linspace(0, 1, 128), np.linspace(0, 1, 128),
                         indexing="ij")
    smooth = np.stack([np.sin(2 * yy + 1), np.cos(3 * xx), yy * xx,
                       0.5 + 0.4 * np.sin(xx + yy)], 0)
    rgba = jnp.asarray(
        np.tile(smooth[None, None], (1, 4, 1, 1, 1)).astype(np.float32) * 0.5
        + 0.25)
    cot = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 3, 128, 128)).astype(np.float32))

    from gmpi_tpu.core.renderer import homography_grid

    flat_ray = jnp.broadcast_to(ray_dir[:, None], (1, 4, 3, 128, 128)
                                ).reshape(4, 3, 128, 128)
    flat_eye = jnp.broadcast_to(eye[:, None], (1, 4, 3)).reshape(4, 3)
    flat_z = jnp.broadcast_to(z_dir[:, None], (1, 4, 3)).reshape(4, 3)
    grid, _ = homography_grid(jnp.asarray(geom.dhw), flat_eye, flat_ray, flat_z)
    by, bx = required_bands((4, 4, 128, 128), grid)
    bands = (by + 8, bx + 8)  # slack for the eye perturbation below

    def loss(eye_x, tb):
        e = eye.at[0, 0].add(eye_x)
        out = _render(rgba, geom.dhw, ray_dir, e, z_dir,
                      tiled_bands=tb, stop_pose_grad=False)
        return jnp.sum(out.color * cot)

    # generic eye offset: the fixture's frontal pose aligns every pixel
    # exactly with a texel center — a bilinear *kink*, where the two warp
    # formulations legitimately pick different subgradients.  Off-kink the
    # derivative is unique and the formulations must agree.
    x0 = 0.00337
    g_tiled = float(jax.grad(loss)(x0, bands))
    g_gather = float(jax.grad(loss)(x0, None))
    assert g_tiled != 0.0
    np.testing.assert_allclose(g_tiled, g_gather, rtol=1e-4)


@pytest.mark.slow
def test_chunked_per_chunk_bands_matches_full():
    """Per-chunk band lists (python-unrolled slabs) == uniform-band render."""
    from gmpi_tpu.core.renderer import render_mpi, render_mpi_chunked, homography_grid
    from gmpi_tpu.ops.tiled_warp import required_bands
    from gmpi_tpu.ops.tiled_warp_adjoint import check_monotone, required_output_bands

    geom, rgba, ray_dir, eye, z_dir = build_fixture(n_planes=8, tex=64, img=64, n_views=2)
    v, l, chunk = 2, 8, 4
    dhw_f = jnp.broadcast_to(geom.dhw[None], (v, l, 3)).reshape(v * l, 3)
    ray_f = jnp.broadcast_to(ray_dir[:, None], (v, l, 3, 64, 64)).reshape(v * l, 3, 64, 64)
    eye_f = jnp.broadcast_to(eye[:, None], (v, l, 3)).reshape(v * l, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (v, l, 3)).reshape(v * l, 3)
    grid, _ = homography_grid(dhw_f, eye_f, ray_f, z_f)
    grid_c = grid.reshape(v, l, 64, 64, 2)

    bands = []
    for k in range(l // chunk):
        g_k = grid_c[:, k * chunk : (k + 1) * chunk].reshape(v * chunk, 64, 64, 2)
        shape_k = (v * chunk, 4, 64, 64)
        by, bx = required_bands(shape_k, g_k, tile=(8, 64))
        assert check_monotone(shape_k, g_k)
        # adjoint tile must mirror _sample's heuristic: (32, tex_w) at 64^2
        pbr, pbc = required_output_bands(shape_k, g_k, tile=(32, 64))
        bands.append((int(by), int(bx), int(pbr) + 2, int(pbc) + 2))

    ref = render_mpi(jnp.asarray(rgba), geom.dhw, ray_dir, eye, z_dir)
    out = render_mpi_chunked(jnp.asarray(rgba), geom.dhw, ray_dir, eye, z_dir,
                             plane_chunk=chunk, tiled_bands=bands)
    np.testing.assert_allclose(np.asarray(out.color), np.asarray(ref.color), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(ref.depth), rtol=1e-4, atol=1e-5)

    # gradients flow through the per-chunk custom-vjp path
    def loss(x):
        o = render_mpi_chunked(x, geom.dhw, ray_dir, eye, z_dir,
                               plane_chunk=chunk, tiled_bands=bands)
        return jnp.sum(o.color) + jnp.sum(o.depth)

    def loss_ref(x):
        o = render_mpi(x, geom.dhw, ray_dir, eye, z_dir)
        return jnp.sum(o.color) + jnp.sum(o.depth)

    g = jax.grad(loss)(jnp.asarray(rgba))
    g_ref = jax.grad(loss_ref)(jnp.asarray(rgba))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_poison_if_rays_escape():
    """Runtime ray-coverage check (``gmpi/core/mpi.py:381-395`` analogue):
    passes through on a fitted volume, NaN-poisons when the camera yaw leaves
    the truncated range the volume was fitted for."""
    from gmpi_tpu.core.renderer import poison_if_rays_escape, ray_coverage_ok

    geom, rgba, ray_dir, eye, z_dir = build_fixture()
    color = jnp.zeros((ray_dir.shape[0], 3, 48, 48), jnp.float32)
    ok_col = jax.jit(poison_if_rays_escape)(color, geom.dhw[-1], eye, ray_dir, z_dir)
    assert bool(jnp.all(jnp.isfinite(ok_col)))
    assert bool(jax.jit(ray_coverage_ok)(geom.dhw[-1], eye, ray_dir, z_dir))

    # a yaw far outside the fitted +/-2 sigma range misses the last plane
    c2w_bad = poses_mod.c2w_from_yaw_pitch(
        jnp.asarray([[1.2]]), jnp.asarray([[0.0]]), 1.0, 1.0)
    intr = cam.intrinsics_from_fov(12.6, 48, 48)
    rd_b, eye_b, zd_b = cam.generate_rays(intr, c2w_bad)
    bad_col = jax.jit(poison_if_rays_escape)(
        color[:1], geom.dhw[-1], eye_b, rd_b, zd_b)
    assert bool(jnp.all(jnp.isnan(bad_col)))

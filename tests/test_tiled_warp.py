"""Tile-banded MXU warp vs the gather-based grid_sample (which is itself
torch-parity-tested), on synthetic homography-like grids and on real renderer
camera grids."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.core import poses as poses_mod
from gmpi_tpu.core.renderer import homography_grid
from gmpi_tpu.ops.grid_sample import grid_sample_bilinear
from gmpi_tpu.ops.tiled_warp import grid_sample_tiled, required_bands


def _homography_grids(n_views=2, n_planes=6, img=64):
    geom = geom_mod.build_plane_geometry(
        n_planes=n_planes, min_d=0.95, max_d=1.12, fov_deg=12.6,
        sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
    )
    yaws = jnp.linspace(-0.55, 0.55, n_views).reshape(-1, 1)
    pitches = jnp.linspace(-0.25, 0.25, n_views).reshape(-1, 1)
    c2w = poses_mod.c2w_from_yaw_pitch(yaws, pitches, 1.0, 1.0)
    intr = cam.intrinsics_from_fov(12.6, img, img)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    v, l = n_views, n_planes
    dhw = jnp.broadcast_to(geom.dhw[None], (v, l, 3)).reshape(v * l, 3)
    ray = jnp.broadcast_to(ray_dir[:, None], (v, l, 3, img, img)).reshape(v * l, 3, img, img)
    eye_f = jnp.broadcast_to(eye[:, None], (v, l, 3)).reshape(v * l, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (v, l, 3)).reshape(v * l, 3)
    grid, _ = homography_grid(dhw, eye_f, ray, z_f)
    return grid


def test_tiled_matches_gather_synthetic():
    rng = np.random.default_rng(0)
    N, C, H, W = 3, 4, 32, 128
    tex = jnp.asarray(rng.random((N, C, H, W)).astype(np.float32))
    ii, jj = np.meshgrid(np.linspace(-1.2, 1.2, H), np.linspace(-1.2, 1.2, W), indexing="ij")
    grid = jnp.asarray(
        np.stack([np.stack([jj + 0.02 * ii, ii * 0.9 - 0.05 * jj], -1)] * N).astype(np.float32)
    )
    by, bx = required_bands(tex.shape, grid, tile=(8, 128))
    ref = grid_sample_bilinear(tex, grid)
    out = grid_sample_tiled(tex, grid, band_y=by, band_x=bx, tile=(8, 128))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_tiled_matches_gather_real_camera_grids():
    """Grids from the actual MPI homography over a wide pose range."""
    rng = np.random.default_rng(1)
    grid = _homography_grids(n_views=2, n_planes=6, img=64)
    n = grid.shape[0]
    tex = jnp.asarray(rng.random((n, 4, 64, 64)).astype(np.float32))
    by, bx = required_bands(tex.shape, grid, tile=(8, 64))
    assert by <= 48 and bx <= 160, (by, bx)  # bands stay modest for GMPI poses
    ref = grid_sample_bilinear(tex, grid)
    out = grid_sample_tiled(tex, grid, band_y=by, band_x=bx, tile=(8, 64))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_tiled_gradients_match():
    rng = np.random.default_rng(2)
    grid = _homography_grids(n_views=1, n_planes=4, img=32)
    n = grid.shape[0]
    tex = jnp.asarray(rng.random((n, 4, 32, 32)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((n, 4, 32, 32)).astype(np.float32))
    by, bx = required_bands(tex.shape, grid, tile=(8, 32))

    g_ref = jax.grad(lambda t: jnp.sum(grid_sample_bilinear(t, grid) * cot))(tex)
    g_out = jax.grad(lambda t: jnp.sum(grid_sample_tiled(t, grid, by, bx, tile=(8, 32)) * cot))(tex)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_tiled_zero_padding_out_of_range():
    """Pixels sampling fully outside the texture give exactly zero."""
    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.random((1, 4, 16, 128)).astype(np.float32))
    grid = jnp.full((1, 8, 128, 2), 3.0, jnp.float32)  # way outside
    out = grid_sample_tiled(tex, grid, band_y=16, band_x=64, tile=(8, 128))
    np.testing.assert_array_equal(np.asarray(out), 0.0)


@pytest.mark.slow
def test_row_scan_matches_vectorized():
    rng = np.random.default_rng(4)
    grid = _homography_grids(n_views=1, n_planes=4, img=64)
    n = grid.shape[0]
    tex = jnp.asarray(rng.random((n, 4, 64, 64)).astype(np.float32))
    by, bx = required_bands(tex.shape, grid, tile=(8, 64))
    a = grid_sample_tiled(tex, grid, by, bx, tile=(8, 64), row_scan=False)
    b = grid_sample_tiled(tex, grid, by, bx, tile=(8, 64), row_scan=True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-6)
    # and gradients
    cot = jnp.asarray(rng.standard_normal(a.shape).astype(np.float32))
    ga = jax.grad(lambda t: jnp.sum(grid_sample_tiled(t, grid, by, bx, tile=(8, 64)) * cot))(tex)
    gb = jax.grad(lambda t: jnp.sum(grid_sample_tiled(t, grid, by, bx, tile=(8, 64), row_scan=True) * cot))(tex)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_bands_for_config():
    from gmpi_tpu.config import get_config
    from gmpi_tpu.core.bands import bands_for_config, estimate_bands

    cfg = get_config("FFHQ256")
    bands = bands_for_config(cfg)
    assert bands is not None
    by, bx = bands[0], bands[1]
    assert 8 <= by <= 128 and 128 <= bx <= 512, (by, bx)
    if len(bands) == 4:  # adjoint bands present when warp is monotone
        assert bands[2] >= 8 and bands[3] >= 128
    # small images skip tiling
    assert bands_for_config(cfg, img_size=64) is None


def test_adjoint_vjp_matches_autodiff():
    from gmpi_tpu.ops.tiled_warp import make_tiled_warp_with_adjoint
    from gmpi_tpu.ops.tiled_warp_adjoint import check_monotone, required_output_bands

    rng = np.random.default_rng(6)
    grid = _homography_grids(n_views=2, n_planes=4, img=64)
    n = grid.shape[0]
    tex = jnp.asarray(rng.random((n, 4, 64, 64)).astype(np.float32))
    assert check_monotone(tex.shape, grid)
    by, bx = required_bands(tex.shape, grid, tile=(8, 64))
    pbr, pbc = required_output_bands(tex.shape, grid, tile=(8, 64))
    cot = jnp.asarray(rng.standard_normal((n, 4, 64, 64)).astype(np.float32))

    fn = make_tiled_warp_with_adjoint(by, bx, (pbr, pbc), tile=(8, 64), adjoint_tile=(8, 64))
    g_ref = jax.grad(lambda t: jnp.sum(grid_sample_bilinear(t, grid) * cot))(tex)
    g_new = jax.grad(lambda t: jnp.sum(fn(t, grid) * cot))(tex)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), rtol=1e-4, atol=1e-4)
    # forward identical too
    np.testing.assert_allclose(
        np.asarray(fn(tex, grid)), np.asarray(grid_sample_bilinear(tex, grid)),
        rtol=1e-4, atol=1e-5,
    )


def test_pallas_patch_backend_interpret():
    """Pallas DMA patch-gather backend (interpret mode) matches the XLA path;
    bands carry the DMA alignment slack."""
    rng = np.random.default_rng(9)
    grid = _homography_grids(n_views=1, n_planes=4, img=64)
    n = grid.shape[0]
    tex = jnp.asarray(rng.random((n, 4, 64, 64)).astype(np.float32))
    by, bx = required_bands(tex.shape, grid, tile=(8, 64))
    by_a = ((int(by) + 62) // 32) * 32
    bx_a = ((int(bx) + 14) // 8) * 8
    ref = grid_sample_bilinear(tex, grid)
    out = grid_sample_tiled(tex, grid, by_a, bx_a, tile=(8, 64),
                            patch_backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_bf16_compute_mode_close_to_f32():
    """Fast mode: bf16 operands + fp32 MXU accumulation stays within ~1e-2."""
    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.random((2, 4, 64, 64)).astype(np.float32))
    base = np.stack(
        np.meshgrid(np.linspace(-0.9, 0.9, 64), np.linspace(-0.9, 0.9, 64), indexing="xy"), -1
    )
    grid = jnp.asarray((base[None] + rng.uniform(-0.02, 0.02, (2, 1, 1, 2))).astype(np.float32))
    by, bx = required_bands(tex.shape, grid, tile=(8, 64))
    ref = grid_sample_tiled(tex, grid, by, bx, tile=(8, 64))
    fast = grid_sample_tiled(tex, grid, by, bx, tile=(8, 64), compute_dtype=jnp.bfloat16)
    assert fast.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-2)

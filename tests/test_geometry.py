"""Plane geometry, depth schedules, pose math — invariants + oracle checks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import geometry as g
from gmpi_tpu.core import poses as poses_mod


def test_sample_distance_inverse_uniform_in_disparity():
    zs = g.sample_distance(0.95, 1.12, 32, "inverse")
    assert zs.shape == (32,)
    assert zs[0] == pytest.approx(0.95, abs=1e-6)
    assert zs[-1] == pytest.approx(1.12, abs=1e-6)
    assert np.all(np.diff(zs) > 0)  # front-to-back
    disp = 1.0 / zs
    np.testing.assert_allclose(np.diff(disp), np.diff(disp)[0], rtol=1e-4)


@pytest.mark.parametrize("method", ["uniform", "log-uniform", "sqrt", "squared"])
def test_sample_distance_methods_monotone(method):
    zs = g.sample_distance(1.0, 10.0, 16, method)
    assert np.all(np.diff(zs) > 0)
    assert zs[0] == pytest.approx(1.0, rel=1e-5)
    assert zs[-1] == pytest.approx(10.0, rel=1e-5)


def test_c2w_looks_at_sphere_center():
    yaws = jnp.array([[0.0], [0.3], [-0.4]])
    pitches = jnp.array([[0.0], [0.2], [-0.1]])
    c2w = poses_mod.c2w_from_yaw_pitch(yaws, pitches, 1.0, 1.0)
    c2w = np.asarray(c2w)
    center = np.array([0.0, 0.0, 1.0])
    for i in range(3):
        eye = c2w[i, :3, 3]
        fwd = c2w[i, :3, 2]
        to_center = center - eye
        to_center /= np.linalg.norm(to_center)
        np.testing.assert_allclose(fwd, to_center, atol=1e-6)
        # camera sits on the unit sphere around the center
        assert np.linalg.norm(eye - center) == pytest.approx(1.0, abs=1e-6)
        # rotation is orthonormal with det +1
        r = c2w[i, :3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-6)


def test_frontal_camera_at_zero_angles():
    """yaw=pitch=0 must give the canonical frontal camera at the origin
    looking down +Z (sphere center (0,0,1), r=1)."""
    c2w = poses_mod.c2w_from_yaw_pitch(jnp.zeros((1, 1)), jnp.zeros((1, 1)), 1.0, 1.0)
    c2w = np.asarray(c2w)[0]
    np.testing.assert_allclose(c2w[:3, 3], [0.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(c2w[:3, :3], np.eye(3), atol=1e-6)


def test_yaw_pitch_roundtrip():
    yaws = jnp.array([[0.1], [-0.35], [0.0]])
    pitches = jnp.array([[-0.2], [0.15], [0.0]])
    c2w = poses_mod.c2w_from_yaw_pitch(yaws, pitches, 1.0, 1.0)
    w2c = jnp.linalg.inv(c2w)
    got_y, got_p = poses_mod.yaw_pitch_from_w2c(w2c, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(yaws), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(pitches), atol=1e-5)


def test_truncated_normal_bounds_and_moments():
    key = jax.random.PRNGKey(0)
    x = poses_mod.truncated_normal(key, (20000,), mean=0.5, std=0.2, n_stds=2.0)
    x = np.asarray(x)
    assert x.min() >= 0.5 - 0.4 - 1e-6
    assert x.max() <= 0.5 + 0.4 + 1e-6
    assert abs(x.mean() - 0.5) < 0.01


def test_plane_geometry_ffhq_like():
    geom = g.build_plane_geometry(
        n_planes=32,
        min_d=0.95,
        max_d=1.12,
        distance_sample_method="inverse",
        fov_deg=12.6,
        sphere_center_z=1.0,
        sphere_r=1.0,
        yaw_mean=0.0,
        yaw_std=0.289,
        pitch_mean=0.0,
        pitch_std=0.127,
        n_truncated_stds=2.0,
        enlarge_factor=1.001,
        confined=True,
    )
    dhw = np.asarray(geom.dhw)
    assert dhw.shape == (32, 3)
    assert np.all(np.diff(dhw[:, 0]) > 0)
    # confined: all planes but the last share the mid-angle frustum size
    assert np.allclose(dhw[:-1, 1], dhw[0, 1])
    assert np.allclose(dhw[:-1, 2], dhw[0, 2])
    # last plane is enlarged to cover the full pose sweep
    assert dhw[-1, 1] > dhw[0, 1]
    assert dhw[-1, 2] > dhw[0, 2]
    # extents are sane for fov 12.6deg at ~1m: frustum ~ 2*tan(6.3deg) ~ 0.22
    assert 0.1 < dhw[0, 1] < 1.0


def test_frustum_bound_fits_camera():
    """Every swept camera's corner rays must land inside the fitted last plane."""
    geom = g.build_plane_geometry(
        n_planes=8,
        min_d=0.95,
        max_d=1.12,
        distance_sample_method="inverse",
        fov_deg=12.6,
        sphere_center_z=1.0,
        sphere_r=1.0,
        yaw_mean=0.0,
        yaw_std=0.289,
        pitch_mean=0.0,
        pitch_std=0.127,
        n_truncated_stds=2.0,
        enlarge_factor=1.001,
        confined=True,
    )
    # extreme corner pose of the truncated range
    c2w = poses_mod.c2w_from_yaw_pitch(
        jnp.array([[2.0 * 0.289]]), jnp.array([[2.0 * 0.127]]), 1.0, 1.0
    )
    intr = cam.intrinsics_from_fov(12.6, 16, 16)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    from gmpi_tpu.core.renderer import check_rays_hit_last_plane

    dhw_last = jnp.broadcast_to(geom.dhw[-1][None], (1, 3))
    assert check_rays_hit_last_plane(dhw_last, eye, ray_dir, z_dir)


def test_normalized_xyz_range():
    geom = g.build_plane_geometry(
        n_planes=4,
        min_d=0.95,
        max_d=1.12,
        distance_sample_method="inverse",
        fov_deg=12.6,
        sphere_center_z=1.0,
        sphere_r=1.0,
        yaw_mean=0.0,
        yaw_std=0.289,
        pitch_mean=0.0,
        pitch_std=0.127,
    )
    xyz = g.multi_res_xyz(geom, 16, normalized=True, value_range="01")
    assert set(xyz.keys()) == {4, 8, 16}
    for res, arr in xyz.items():
        assert arr.shape == (4, res, res, 3)
        a = np.asarray(arr)
        assert a[..., 2].min() >= -1e-6 and a[..., 2].max() <= 1 + 1e-6
        # z constant per plane
        assert np.allclose(a[..., 2].std(axis=(1, 2)), 0.0, atol=1e-7)


def test_plane_interp_weights():
    ws = np.asarray(g.plane_interp_weights(0.95, 1.12, 8, 24, "inverse"))
    assert ws.shape == (24, 10)
    np.testing.assert_allclose(ws.sum(axis=1), 1.0, atol=1e-5)
    # each target uses exactly two adjacent sources
    assert np.all((ws > 0).sum(axis=1) <= 2)

"""Utility-layer tests + renderer physics on toy MPIs (the /verify drive as a
regression test: fixation-relative parallax and near-over-far occlusion)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.core import poses as poses_mod
from gmpi_tpu.core.renderer import render_mpi
from gmpi_tpu.utils.img import (
    color_ramp,
    edge_aware_smooth_loss,
    hex_to_rgb,
    image_gradient,
    to_sym_range,
    to_unit_range,
)
from gmpi_tpu.utils.toy_mpi import add_rect, blank_mpi, checkerboard_mpi, layered_scene


def test_range_conversions():
    x = jnp.asarray([-1.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(to_unit_range(x)), [0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(to_sym_range(to_unit_range(x))), np.asarray(x))


def test_image_gradient_flat_vs_edge():
    flat = jnp.ones((1, 1, 16, 16))
    assert float(jnp.max(image_gradient(flat))) < 1e-6
    edge = jnp.concatenate([jnp.zeros((1, 1, 16, 8)), jnp.ones((1, 1, 16, 8))], axis=3)
    assert float(jnp.max(image_gradient(edge))) > 0.5


def test_edge_aware_smooth_loss():
    rng = np.random.default_rng(0)
    # smooth rgb (few edges) so the non-edge mask is non-empty
    rgb = jnp.broadcast_to(jnp.linspace(0, 1, 16).reshape(1, 1, 1, 16), (2, 3, 16, 16))
    flat_depth = jnp.ones((2, 1, 16, 16))
    assert float(edge_aware_smooth_loss(rgb, flat_depth)) < 1e-6
    noisy_depth = jnp.asarray(rng.random((2, 1, 16, 16)).astype(np.float32))
    assert float(edge_aware_smooth_loss(rgb, noisy_depth)) > 0.0


def test_color_helpers():
    ramp = color_ramp((0, 0, 0), (1, 1, 1), 5)
    assert ramp.shape == (5, 3)
    np.testing.assert_allclose(ramp[2], 0.5)
    np.testing.assert_allclose(hex_to_rgb("#ff0080"), [1.0, 0.0, 128 / 255])


def test_toy_mpi_builders():
    mpi = blank_mpi(4, 32)
    assert mpi.shape == (4, 4, 32, 32)
    np.testing.assert_array_equal(mpi[-1, 3], 1.0)
    add_rect(mpi, 0, (1, 0, 0), size=(0.5, 0.5))
    assert mpi[0, 3].sum() > 0
    cb = checkerboard_mpi(4, 32)
    assert 0 < cb[0, 3].mean() < 1


def test_renderer_physics_on_toy_scene():
    """Orbit-and-fixate camera: planes nearer than the fixation depth move
    opposite to planes farther; near content occludes far content."""
    geom = geom_mod.build_plane_geometry(
        n_planes=4, min_d=0.95, max_d=1.12, fov_deg=12.6,
        sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
    )
    T = 64
    mpi = blank_mpi(4, T)
    add_rect(mpi, 0, (1, 0, 0), center=(0.45, 0.38), size=(0.2, 0.2))  # near, red
    add_rect(mpi, 3, (0, 0, 1), center=(0.55, 0.55), size=(0.3, 0.3))  # far, blue

    cfg = poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127)
    c2w, _, _ = poses_mod.linspace_sphere_poses(5, cfg, horizontal=True)
    intr = cam.intrinsics_from_fov(12.6, T, T)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    rgba5 = jnp.broadcast_to(jnp.asarray(mpi)[None], (5, 4, 4, T, T))
    out = render_mpi(rgba5, geom.dhw, ray_dir, eye, z_dir)
    color = np.asarray(out.color)
    depth = np.asarray(out.depth)

    assert color.min() >= 0 and color.max() <= 1 + 1e-5
    cols = np.arange(T)[None, :]

    def centroid(img, ch):
        m = img[ch]
        return (m * cols).sum() / (m.sum() + 1e-8)

    red_shift = centroid(color[-1], 0) - centroid(color[0], 0)
    blue_shift = centroid(color[-1], 2) - centroid(color[0], 2)
    # near (0.95) vs far (1.12) around fixation depth 1.0: opposite signs,
    # |far/near| ~ 0.12/0.05
    assert red_shift * blue_shift < 0
    assert 1.5 < abs(blue_shift) / abs(red_shift) < 3.5

    # frontal view: red square (near) must win where it overlaps blue
    mid = color[2]
    r0, r1, c0, c1 = int(0.36 * T), int(0.54 * T), int(0.29 * T), int(0.47 * T)
    assert mid[0, r0:r1, c0:c1].mean() > 0.5
    # depth map: red region near plane depth, elsewhere background depth
    assert abs(float(depth[2, 0, (r0 + r1) // 2, (c0 + c1) // 2]) - 0.95) < 0.02
    assert abs(float(depth[2, 0, 2, 2]) - 1.12) < 0.02


# ---------------------------------------------------------------------------
# roofline + inspection
# ---------------------------------------------------------------------------


def test_roofline_accounting():
    from gmpi_tpu.utils.roofline import TPU_V5E, attained, render_cost

    cost = render_cost(1, 96, 1024, 1024, 1024, 1024, backward=True)
    assert cost["bytes"] > 0 and cost["flops"] > 0
    rep = attained(0.2, cost, TPU_V5E)
    assert 0 < rep["sol_fraction"] < 1.5
    assert rep["bound"] in ("memory", "compute")
    # this workload is memory-bound on v5e
    assert rep["bound"] == "memory"


def test_param_summary_and_assert_shape():
    from gmpi_tpu.utils.inspect import assert_shape, param_summary

    tree = {"a": jnp.zeros((2, 3)), "b": {"c": jnp.zeros((4,))}}
    rows, total = param_summary(tree)
    assert total == 10 and len(rows) == 2
    assert_shape(jnp.zeros((2, 5)), (2, None))
    with pytest.raises(AssertionError):
        assert_shape(jnp.zeros((2, 5)), (3, None))


def test_replica_consistency_check():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gmpi_tpu.parallel.mesh import make_mesh
    from gmpi_tpu.utils.inspect import check_replica_consistency

    mesh = make_mesh([8], ("data",))
    x = jax.device_put(jnp.ones((16, 4)), NamedSharding(mesh, P()))
    check_replica_consistency({"w": x})  # replicated, identical -> ok

    # sharded arrays are skipped (each shard holds different slices)
    y = jax.device_put(jnp.arange(16.0).reshape(16, 1), NamedSharding(mesh, P("data")))
    check_replica_consistency({"w": y})


def test_registry():
    from gmpi_tpu.utils.registry import Registry

    reg = Registry()

    @reg.register("model", "foo")
    def foo():
        return 42

    assert reg.get("model", "foo")() == 42
    assert reg.list("model") == ["foo"]
    with pytest.raises(KeyError):
        reg.get("model", "bar")


def test_preprocess_landmarks_and_xflip(tmp_path):
    from PIL import Image

    from gmpi_tpu.data.preprocess import prepare_landmarks, xflip_augment_folder

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(src / f"i{i}.png")

    n = xflip_augment_folder(str(src), str(tmp_path / "flipped"))
    assert n == 6

    def detect(arr):
        if arr[0, 0, 0] % 2 == 0:
            return np.ones((5, 2)) * 3.0
        return None

    ok, failed = prepare_landmarks(str(src), str(tmp_path / "lm"), detect)
    assert ok + failed == 3
    assert (tmp_path / "lm" / "fail_list.txt").exists()


def test_mpi_from_plane_images():
    from gmpi_tpu.utils.toy_mpi import mpi_from_plane_images

    rng = np.random.default_rng(0)
    back = (rng.uniform(0, 255, (16, 16, 4))).astype(np.uint8)
    back[..., 3] = 255
    front = np.zeros((16, 16, 4), np.uint8)
    front[4:8, 6:12] = 200  # small opaque patch
    rgba, dhw, fg = mpi_from_plane_images([back, front], dmin=1.0, dmax=4.0)
    assert rgba.shape == (2, 4, 16, 16) and dhw.shape == (2, 3)
    # front-to-back ordering: plane 0 is the (formerly last) front image
    np.testing.assert_allclose(rgba[0], front.transpose(2, 0, 1) / 255.0)
    assert dhw[0, 0] < dhw[1, 0]  # sorted near -> far
    np.testing.assert_allclose(dhw[:, 2], 1.3 * dhw[:, 0])
    assert fg == {"min_row": 4, "max_row": 7, "min_col": 6, "max_col": 11}


def test_mpi_from_content_images_renders():
    from gmpi_tpu.utils.toy_mpi import mpi_from_content_images

    sq = np.zeros((8, 8, 4), np.uint8)
    sq[...] = (255, 0, 0, 255)
    rgba, dhw = mpi_from_content_images(
        32, [sq, None], [(16, 16), None], positions=[(8, 8), None], dmin=1.0, dmax=2.0
    )
    assert rgba.shape == (2, 4, 32, 32)
    np.testing.assert_allclose(rgba[0, 0, 8:24, 8:24], 1.0)  # pasted red, resized 2x
    np.testing.assert_allclose(rgba[0, 3, 8:24, 8:24], 1.0)
    assert rgba[0, 3, :8].max() == 0.0
    np.testing.assert_allclose(rgba[1, 3], 1.0)  # opaque background plane

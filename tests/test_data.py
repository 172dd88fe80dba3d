"""Data-layer tests: pose conversion vs the reference implementation
(torch oracle from /root/reference), dataset loading from synthetic fixtures,
and sharded-loader semantics."""

import json
import os
import sys
import types
import zipfile

import numpy as np
import pytest
from PIL import Image

from gmpi_tpu.data.datasets import AFHQCat, FFHQ, MetFaces
from gmpi_tpu.data.loader import ShardedLoader
from gmpi_tpu.data.pose_convert import (
    w2c_from_deep3dface,
    w2c_from_pnp_c2w,
)

from tests._reference import import_reference, reference_available

needs_reference = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


def _import_reference_cam_utils():
    return import_reference("gmpi.utils.cam_utils")


@needs_reference
def test_ffhq_pose_matches_reference():
    import torch

    cu = _import_reference_cam_utils()
    rng = np.random.default_rng(0)
    angles = (rng.standard_normal((5, 3)) * 0.3).astype(np.float32)
    trans = (rng.standard_normal((5, 3)) * 0.1).astype(np.float32)

    ours = w2c_from_deep3dface(angles, trans, sphere_center=1.0, sphere_r=1.0, normalize_trans=True)
    theirs = cu.compute_w2c_mat_from_estimated_pose_ffhq(
        torch.from_numpy(angles), torch.from_numpy(trans), 1.0, sphere_r=1.0, normalize_trans=True
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


@needs_reference
def test_afhq_pose_matches_reference():
    import torch
    from scipy.spatial.transform import Rotation

    cu = _import_reference_cam_utils()
    rng = np.random.default_rng(1)
    c2w = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    for i in range(4):
        c2w[i, :3, :3] = Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
        c2w[i, :3, 3] = rng.standard_normal(3) * 2.0 + np.array([0, 0, 3.0])

    ours = w2c_from_pnp_c2w(c2w, sphere_center=2.7, sphere_r=2.7, normalize_trans=True)
    theirs = cu.compute_w2c_mat_from_estimated_pose_afhq(
        torch.from_numpy(c2w), 2.7, sphere_r=2.7, normalize_trans=True
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_normalize_trans_puts_camera_on_sphere():
    rng = np.random.default_rng(2)
    angles = (rng.standard_normal((8, 3)) * 0.3).astype(np.float32)
    trans = (rng.standard_normal((8, 3)) * 0.1).astype(np.float32)
    w2c = w2c_from_deep3dface(angles, trans, sphere_center=1.0, sphere_r=1.0)
    rot, t = w2c[:, :3, :3], w2c[:, :3, 3:]
    cam = -np.linalg.inv(rot) @ t
    dist = np.linalg.norm(cam[:, :, 0] - np.array([0.0, 0.0, 1.0]), axis=1)
    np.testing.assert_allclose(dist, 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# Dataset fixtures
# ---------------------------------------------------------------------------


def _write_mat(path, rng):
    import scipy.io as sio

    sio.savemat(path, {
        "angle": (rng.standard_normal((1, 3)) * 0.2).astype(np.float32),
        "trans": (rng.standard_normal((1, 3)) * 0.1).astype(np.float32),
    })


def _png_bytes(rng, size):
    import io

    arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture
def ffhq_fixture(tmp_path):
    rng = np.random.default_rng(0)
    zpath = tmp_path / "ffhq32x32.zip"
    pose_dir = tmp_path / "coeffs"
    pose_dir.mkdir()
    with zipfile.ZipFile(zpath, "w") as zf:
        for i in range(6):
            name = f"{i:05d}.png"
            zf.writestr(name, _png_bytes(rng, 32))
            _write_mat(pose_dir / f"{i:05d}.mat", rng)
    # fail-list one image
    (pose_dir / "fail_list.txt").write_text("00003.png\n")
    return str(zpath), str(pose_dir)


def test_ffhq_dataset(ffhq_fixture):
    zpath, pose_dir = ffhq_fixture
    ds = FFHQ(zpath, 32, 16, pose_dir, sphere_center=1.0, sphere_r=1.0, flat_pose_dim=16)
    assert len(ds) == 5  # 6 minus fail-listed
    img, pose, yaw, pitch = ds[0]
    assert img.shape == (3, 16, 16)
    assert img.min() >= -1.0 and img.max() <= 1.0
    assert pose.shape == (16,)
    assert np.isfinite(pose).all()


def test_metfaces_dataset(tmp_path):
    rng = np.random.default_rng(1)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    pose_dir = tmp_path / "poses"
    (pose_dir / "coeffs").mkdir(parents=True)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(img_dir / f"m{i}.png")
        _write_mat(pose_dir / "coeffs" / f"m{i}.mat", rng)
    ds = MetFaces(str(img_dir), 32, 32, str(pose_dir), sphere_center=1.0, flat_pose_dim=9)
    assert len(ds) == 3
    img, pose, yaw, pitch = ds[1]
    assert img.shape == (3, 32, 32) and pose.shape == (9,)


def test_afhq_dataset(tmp_path):
    rng = np.random.default_rng(2)
    img_dir = tmp_path / "afhq"
    img_dir.mkdir()
    labels = []
    for i in range(4):
        name = f"cat{i}.png"
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(img_dir / name)
        c2w = np.eye(4)
        c2w[:3, 3] = [0, 0, 3.0 + 0.1 * i]
        labels.append([name, list(c2w.reshape(-1).astype(float)) + [0.0] * 9])
    (img_dir / "dataset.json").write_text(json.dumps({"labels": labels}))
    ds = AFHQCat(str(img_dir), 32, 32, str(img_dir), sphere_center=2.7, sphere_r=2.7, flat_pose_dim=16)
    img, pose, yaw, pitch = ds[0]
    assert img.shape == (3, 32, 32) and pose.shape == (16,)
    assert np.isfinite(yaw).all() and np.isfinite(pitch).all()


def test_sharded_loader(ffhq_fixture):
    zpath, pose_dir = ffhq_fixture
    ds = FFHQ(zpath, 32, 16, pose_dir, sphere_center=1.0, flat_pose_dim=16)
    l0 = ShardedLoader(ds, batch_size=2, shard_id=0, num_shards=2, seed=7, num_workers=2)
    l1 = ShardedLoader(ds, batch_size=2, shard_id=1, num_shards=2, seed=7, num_workers=2)
    b0 = list(l0.epoch(0))
    b1 = list(l1.epoch(0))
    assert len(b0) == len(b1) == 1  # ceil(5/2)=3 per shard -> 1 full batch of 2
    assert b0[0][0].shape == (2, 3, 16, 16)
    # same seed+epoch on both shards -> disjoint-ish deterministic split
    again = list(l0.epoch(0))
    np.testing.assert_array_equal(b0[0][0], again[0][0])
    # different epoch -> different order
    other = list(l0.epoch(1))
    assert not np.array_equal(b0[0][0], other[0][0])


# ---------------------------------------------------------------------------
# native PNG decoder
# ---------------------------------------------------------------------------


def test_fastpng_decode_matches_pil():
    import io

    from gmpi_tpu.data import fastpng

    if not fastpng.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    for shape in [(33, 47, 3), (16, 16, 4), (21, 9, 3)]:
        arr = rng.integers(0, 255, shape, dtype=np.uint8)
        buf = io.BytesIO()
        mode = "RGBA" if shape[2] == 4 else "RGB"
        Image.fromarray(arr, mode).save(buf, format="PNG")
        out = fastpng.decode(buf.getvalue())
        assert out is not None
        np.testing.assert_array_equal(out, arr)


def test_fastpng_box_downscale():
    from gmpi_tpu.data import fastpng

    if not fastpng.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    out = fastpng.box_downscale(img, 4)
    assert out is not None and out.shape == (8, 8, 3)
    want = img.reshape(8, 4, 8, 4, 3).astype(np.uint32).sum(axis=(1, 3))
    want = ((want + 8) // 16).astype(np.uint8)
    np.testing.assert_array_equal(out, want)

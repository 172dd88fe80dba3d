"""Datasets: FFHQ (zip + Deep3DFace ``.mat`` poses), AFHQCat (folder + EG3D
``dataset.json`` PnP poses), MetFaces (x-flipped folder + ``.mat``).

Numpy/PIL re-design of ``gmpi/datasets.py`` — no torch dependency in the
input pipeline.  Each sample is ``(img [-1,1] CHW float32, flat_w2c (9|16),
yaw, pitch)``; pose conversion happens inside the dataset, exactly as the
reference does (``datasets.py:121-123, 224-226``).
"""

from __future__ import annotations

import json
import os
import zipfile
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

from gmpi_tpu.data import fastpng
from gmpi_tpu.data.pose_convert import (
    deep3dface_yaw_pitch,
    w2c_from_deep3dface,
    w2c_from_pnp_c2w,
)


def _open_png(data: bytes) -> Image.Image:
    """Native fastpng decode (the pyspng analogue) with PIL fallback."""
    arr = fastpng.decode(data)
    if arr is not None:
        if arr.shape[2] == 2:  # gray+alpha -> let PIL handle rare cases
            arr = None
    if arr is not None:
        mode = {1: "L", 3: "RGB", 4: "RGBA"}[arr.shape[2]]
        return Image.fromarray(arr[..., 0] if arr.shape[2] == 1 else arr, mode)
    import io

    img = Image.open(io.BytesIO(data))
    img.load()
    return img

IMG_EXTS = (".png", ".jpg", ".jpeg")


def _load_fail_list(pose_data_path: str) -> List[str]:
    p = os.path.join(pose_data_path, "fail_list.txt")
    if os.path.exists(p):
        with open(p) as f:
            return [line.strip() for line in f]
    return []


def _to_tensor_range(img: Image.Image, img_size: int) -> np.ndarray:
    """LANCZOS resize + [0,255] -> [-1,1] CHW float32 (torchvision
    ``Resize(LANCZOS) + ToTensor + Normalize(.5,.5)`` semantics)."""
    if img.size != (img_size, img_size):
        img = img.resize((img_size, img_size), Image.LANCZOS)
    x = np.asarray(img, np.float32) / 255.0
    if x.ndim == 2:
        x = x[:, :, None].repeat(3, axis=2)
    x = x[:, :, :3]
    return (x.transpose(2, 0, 1) - 0.5) / 0.5


def _flat_pose(w2c: np.ndarray, flat_pose_dim: int) -> np.ndarray:
    if flat_pose_dim == 9:
        return w2c[0, :3, :3].reshape(-1).astype(np.float32)
    return w2c[0].reshape(-1).astype(np.float32)


class FFHQ:
    """FFHQ zip + per-image Deep3DFace coefficient ``.mat`` files
    (``gmpi/datasets.py:24-149``)."""

    def __init__(
        self,
        dataset_path: str,
        raw_img_size: int,
        img_size: int,
        pose_data_path: str,
        sphere_center: float,
        sphere_r: float = 1.0,
        flat_pose_dim: int = 16,
        **_,
    ):
        fail = set(_load_fail_list(pose_data_path))
        with zipfile.ZipFile(dataset_path) as zf:
            names = sorted(
                n for n in zf.namelist() if os.path.splitext(n)[1].lower() in IMG_EXTS
            )
        im_path = [n for n in names if n not in fail]
        pose_path = [os.path.join(pose_data_path, n.replace("png", "mat")) for n in im_path]
        self.data = list(zip(im_path, pose_path))
        assert self.data, f"no images found in {dataset_path}"
        self.zip_path = dataset_path
        self._zip: Optional[zipfile.ZipFile] = None
        self.raw_img_size = raw_img_size
        self.img_size = img_size
        self.sphere_center = sphere_center
        self.sphere_r = sphere_r
        self.flat_pose_dim = flat_pose_dim

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index: int):
        import scipy.io as sio

        if self._zip is None:  # lazily opened per worker thread/process
            self._zip = zipfile.ZipFile(self.zip_path)
        img_f, pose_f = self.data[index]
        with self._zip.open(img_f) as f:
            img = _open_png(f.read())
        assert img.size == (self.raw_img_size, self.raw_img_size), (img.size, self.raw_img_size)
        x = _to_tensor_range(img, self.img_size)

        coeffs = sio.loadmat(pose_f)
        angles, trans = coeffs["angle"], coeffs["trans"]
        w2c = w2c_from_deep3dface(angles, trans, self.sphere_center, self.sphere_r, normalize_trans=True)
        yaw, pitch = deep3dface_yaw_pitch(angles)
        return x, _flat_pose(w2c, self.flat_pose_dim), yaw[0], pitch[0]


class AFHQCat:
    """AFHQ-cat image folder + EG3D ``dataset.json`` PnP camera poses
    (``gmpi/datasets.py:152-240``)."""

    def __init__(
        self,
        dataset_path: str,
        raw_img_size: int,
        img_size: int,
        pose_data_path: str,
        sphere_center: float,
        sphere_r: float = 2.7,
        flat_pose_dim: int = 16,
        **_,
    ):
        with open(os.path.join(pose_data_path, "dataset.json")) as f:
            self.all_data = json.load(f)["labels"]
        assert self.all_data
        self.dataset_path = dataset_path
        self.raw_img_size = raw_img_size
        self.img_size = img_size
        self.sphere_center = sphere_center
        self.sphere_r = sphere_r
        self.flat_pose_dim = flat_pose_dim

    def __len__(self):
        return len(self.all_data)

    def __getitem__(self, index: int):
        img_fname, pose_info = self.all_data[index]
        img = Image.open(os.path.join(self.dataset_path, img_fname))
        assert img.size == (self.raw_img_size, self.raw_img_size)
        x = _to_tensor_range(img, self.img_size)
        c2w = np.array(pose_info[:16], np.float64).reshape(1, 4, 4)
        w2c = w2c_from_pnp_c2w(c2w, self.sphere_center, self.sphere_r, normalize_trans=True)
        # recover (yaw, pitch) from the matrix (``cam_utils.py:1005-1050``)
        from gmpi_tpu.core.poses import yaw_pitch_from_w2c
        import jax.numpy as jnp

        yaw, pitch = yaw_pitch_from_w2c(
            jnp.asarray(w2c), jnp.asarray([0.0, 0.0, self.sphere_center], jnp.float32)
        )
        return x, _flat_pose(w2c, self.flat_pose_dim), np.asarray(yaw)[0], np.asarray(pitch)[0]


class MetFaces:
    """MetFaces x-flip-augmented folder + ``.mat`` poses
    (``gmpi/datasets.py:243-356``)."""

    def __init__(
        self,
        dataset_path: str,
        raw_img_size: int,
        img_size: int,
        pose_data_path: str,
        sphere_center: float,
        sphere_r: float = 1.0,
        flat_pose_dim: int = 16,
        **_,
    ):
        fail = set(_load_fail_list(pose_data_path))
        all_im = [
            os.path.join(dataset_path, n)
            for n in sorted(os.listdir(dataset_path))
            if n.endswith("png")
        ]
        im_path = [p for p in all_im if os.path.basename(p) not in fail]
        pose_path = [
            os.path.join(pose_data_path, "coeffs", os.path.basename(p).replace("png", "mat"))
            for p in im_path
        ]
        self.data = list(zip(im_path, pose_path))
        assert self.data
        self.raw_img_size = raw_img_size
        self.img_size = img_size
        self.sphere_center = sphere_center
        self.sphere_r = sphere_r
        self.flat_pose_dim = flat_pose_dim

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index: int):
        import scipy.io as sio

        img_f, pose_f = self.data[index]
        with open(img_f, "rb") as f:
            img = _open_png(f.read())
        assert img.size == (self.raw_img_size, self.raw_img_size)
        x = _to_tensor_range(img, self.img_size)
        coeffs = sio.loadmat(pose_f)
        angles, trans = coeffs["angle"], coeffs["trans"]
        w2c = w2c_from_deep3dface(angles, trans, self.sphere_center, self.sphere_r, normalize_trans=True)
        yaw, pitch = deep3dface_yaw_pitch(angles)
        return x, _flat_pose(w2c, self.flat_pose_dim), yaw[0], pitch[0]


DATASETS = {"FFHQ": FFHQ, "AFHQCat": AFHQCat, "MetFaces": MetFaces}


def get_dataset(name: str, **kwargs):
    return DATASETS[name](**kwargs)

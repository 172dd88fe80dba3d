"""Evaluation harness — prepare real/fake image sets and compute metrics.

Mirrors the reference eval pipeline (``gmpi/eval/eval.sh:64-172``):

* ``prepare_real_images`` — dump dataset images at eval resolution
  (``prepare_real_data.py:17-52``);
* ``prepare_fake_images`` — render n images with per-image seeds
  (seed = image index, ``prepare_fake_data.py:204``), tasks:
  - ``fid_kid``: one random-pose render per z;
  - ``consistency``: two views per z (``prepare_fake_data.py`` consistency
    task) for downstream face-identity scoring;
  - ``geometry``: renders at 224² and saves depth + (pitch, yaw) arrays for
    Deep3DFace-based geometry scoring (``:105-108, 180-258``);
* ``compute_fid_kid_dirs`` — FID + KID between two image directories given a
  feature extractor (the reference shells out to torch_fidelity;
  ``compute_fid_kid.py:22-30``).

Identity-consistency (ArcFace) and pose-estimation (Deep3DFace) models are
external in the reference too (separate conda envs, ``eval.sh:58-62``); the
hooks here accept any embedder/estimator callable.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from gmpi_tpu.config import ExperimentConfig
from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.core import poses as poses_mod
from gmpi_tpu.core.renderer import render_mpi
from gmpi_tpu.eval.generate import generate_mpi
from gmpi_tpu.eval.metrics import (
    cosine_similarity,
    fid_from_features,
    kid_from_features,
)


def _save_png(path: str, img_chw: np.ndarray) -> None:
    """img in [-1, 1] CHW -> png."""
    arr = ((img_chw.transpose(1, 2, 0) + 1.0) / 2.0 * 255.0).clip(0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def prepare_real_images(dataset, out_dir: str, n_imgs: int) -> int:
    os.makedirs(out_dir, exist_ok=True)
    n = min(n_imgs, len(dataset))
    for i in range(n):
        img, *_ = dataset[i]
        _save_png(os.path.join(out_dir, f"{i:06d}.png"), np.asarray(img))
    return n


class FakeImageGenerator:
    """Seeded eval-time sampler around (generator, renderer) for one config."""

    def __init__(
        self,
        cfg: ExperimentConfig,
        params: dict,
        buffers: dict,
        n_planes: Optional[int] = None,
        img_size: Optional[int] = None,
        chunk_n_planes: int = -1,
        truncation_psi: float = 1.0,
        sanity_full_alpha: bool = False,
        use_fused: bool = False,
    ):
        """``sanity_full_alpha=True`` is the ``stylegan2_sanity_check`` mode
        (``gmpi/eval/eval.sh:43-47``, ``prepare_fake_data.py:51-56``): force
        every plane's alpha to 1 so the render collapses to the nearest
        plane's shared RGB — with raw StyleGAN2 warm-start weights the FID
        must match vanilla StyleGAN2, validating the renderer+eval plumbing
        itself."""
        self.cfg = cfg
        self.sanity_full_alpha = sanity_full_alpha
        self.gen_cfg = cfg.generator_cfg()
        self.params = params
        self.buffers = buffers
        self.n_planes = n_planes or cfg.eval_n_planes
        self.img_size = img_size or cfg.resolution
        self.chunk = chunk_n_planes
        self.psi = truncation_psi
        # eval-time plane geometry at the eval plane count
        import dataclasses as _dc

        eval_cfg = _dc.replace(cfg, planes=_dc.replace(cfg.planes, n_planes=self.n_planes))
        self.geom = eval_cfg.plane_geometry()
        self.xyz_dict = cfg.multi_res_xyz(self.geom)
        self.intr = cam.intrinsics_from_fov(cfg.fov_deg, self.img_size, self.img_size)

        from gmpi_tpu.core.bands import bands_for_config, fused_plans_for_config

        # fused kernel needs subtile-divisible shapes (e.g. the 224^2
        # geometry renders fall back to the banded path)
        fused_ok = (use_fused and cfg.planes.align_corners
                    and self.img_size % 128 == 0
                    and cfg.hparams.tex_size % 16 == 0)
        if fused_ok:
            from gmpi_tpu.core.renderer import render_mpi_fused

            plans = fused_plans_for_config(
                cfg, img_size=self.img_size, n_planes=self.n_planes)

            def _render(mpi, yaws, pitches):
                c2w, _, _ = poses_mod.sample_sphere_poses(
                    None, mpi.shape[0], cfg.camera, given_yaws=yaws, given_pitches=pitches
                )
                ray_dir, eye, z_dir = cam.generate_rays(self.intr, c2w)
                out = render_mpi_fused(mpi, jnp.asarray(self.geom.dhw),
                                       ray_dir, eye, z_dir, plans)
                return out.color * 2.0 - 1.0, out.depth
        else:
            tiled_bands = bands_for_config(cfg, img_size=self.img_size, n_planes=self.n_planes)

            def _render(mpi, yaws, pitches):
                c2w, _, _ = poses_mod.sample_sphere_poses(
                    None, mpi.shape[0], cfg.camera, given_yaws=yaws, given_pitches=pitches
                )
                ray_dir, eye, z_dir = cam.generate_rays(self.intr, c2w)
                out = render_mpi(mpi, self.geom.dhw, ray_dir, eye, z_dir, cfg.planes.align_corners,
                                 tiled_bands=tiled_bands)
                return out.color * 2.0 - 1.0, out.depth

        self._render = jax.jit(_render)

    def sample_mpi(self, seed: int, batch: int = 1) -> jnp.ndarray:
        key = jax.random.key(seed)
        kz, _ = jax.random.split(key)
        z = jax.random.normal(kz, (batch, self.cfg.train.z_dim), jnp.float32)
        mpi = generate_mpi(
            self.gen_cfg, self.params, self.buffers, z, self.xyz_dict, self.n_planes,
            chunk_n_planes=self.chunk, truncation_psi=self.psi, noise_mode="const",
        )
        if self.sanity_full_alpha:
            mpi = jnp.concatenate([mpi[:, :, :3], jnp.ones_like(mpi[:, :, 3:4])], axis=2)
        return mpi

    def sample_views(self, seed: int, n_views: int):
        key = jax.random.fold_in(jax.random.key(seed), 17)
        return poses_mod.sample_yaw_pitch(key, n_views, self.cfg.camera)

    def render(self, mpi, yaws, pitches):
        return self._render(mpi, yaws, pitches)


def prepare_fake_images(
    gen: FakeImageGenerator,
    out_dir: str,
    n_imgs: int,
    task: str = "fid_kid",
) -> None:
    """Per-image-seeded fake image dump (``prepare_fake_data.py:180-258``)."""
    assert task in ("fid_kid", "consistency", "geometry")
    rgb_dir = os.path.join(out_dir, "rgb")
    os.makedirs(rgb_dir, exist_ok=True)
    if task == "geometry":
        depth_dir = os.path.join(out_dir, "depth")
        angle_dir = os.path.join(out_dir, "angle")
        os.makedirs(depth_dir, exist_ok=True)
        os.makedirs(angle_dir, exist_ok=True)

    n_views = 2 if task == "consistency" else 1
    for i in range(n_imgs):
        mpi = gen.sample_mpi(seed=i)
        yaws, pitches = gen.sample_views(seed=i, n_views=n_views)
        mpi_v = jnp.broadcast_to(mpi, (n_views, *mpi.shape[1:]))
        imgs, depths = gen.render(mpi_v, yaws, pitches)
        imgs = np.asarray(imgs)
        for v in range(n_views):
            name = f"{i:06d}_{v}.png" if task == "consistency" else f"{i:06d}.png"
            _save_png(os.path.join(rgb_dir, name), imgs[v])
        if task == "geometry":
            np.save(os.path.join(depth_dir, f"{i:06d}.npy"), np.asarray(depths)[0, 0])
            np.save(
                os.path.join(angle_dir, f"{i:06d}.npy"),
                np.array([float(pitches[0, 0]), float(yaws[0, 0])], np.float32),
            )


def load_images_chw(dir_path: str) -> np.ndarray:
    """Load a directory of PNGs -> [N, 3, H, W] float32 in [0, 1]."""
    files = sorted(f for f in os.listdir(dir_path) if f.endswith(".png"))
    out = []
    for f in files:
        arr = np.asarray(Image.open(os.path.join(dir_path, f)), np.float32) / 255.0
        out.append(arr.transpose(2, 0, 1)[:3])
    return np.stack(out)


def compute_fid_kid_dirs(
    real_dir: str,
    fake_dir: str,
    feature_fn: Callable[[np.ndarray], np.ndarray],
    kid_subset_size: int = 1000,
    kid_subsets: int = 100,
) -> Dict[str, float]:
    """FID + KID between two image dirs via a pluggable extractor."""
    real = feature_fn(load_images_chw(real_dir))
    fake = feature_fn(load_images_chw(fake_dir))
    fid = fid_from_features(fake, real)
    kid_mean, kid_std = kid_from_features(
        fake, real, subset_size=kid_subset_size, n_subsets=kid_subsets
    )
    return {
        "frechet_inception_distance": fid,
        "kernel_inception_distance_mean": kid_mean,
        "kernel_inception_distance_std": kid_std,
    }


def compute_geometry_dir(
    fake_dir: str, n_imgs: int, detector, estimator
) -> Dict[str, float]:
    """Depth + pose-angle error over a ``prepare_fake_images(task="geometry")``
    dump (``gmpi/eval/compute_geometry.py:24-68``): MTCNN-style landmarks ->
    Deep3DFace-style estimation -> z-normalized depth MSE on the face mask +
    MSE between rendered (pitch, -yaw, 0) and predicted angles.  Images with
    no detected face are skipped, as in the reference."""
    from gmpi_tpu.eval.metrics import angle_error, normalized_depth_error

    rgb_dir = os.path.join(fake_dir, "rgb")
    depth_dir = os.path.join(fake_dir, "depth")
    angle_dir = os.path.join(fake_dir, "angle")
    d_errs, a_errs, n_skipped = [], [], 0
    for i in range(n_imgs):
        img = np.asarray(Image.open(os.path.join(rgb_dir, f"{i:06d}.png")))
        lm = detector.detect(img)
        pred = estimator.estimate(img, lm) if lm is not None else None
        if pred is None:
            n_skipped += 1
            continue
        rendered_pitch_yaw = np.load(os.path.join(angle_dir, f"{i:06d}.npy"))
        a_errs.append(angle_error(rendered_pitch_yaw, pred["angles"]))
        if pred.get("depth") is not None and pred.get("mask") is not None:
            rendered_depth = np.load(os.path.join(depth_dir, f"{i:06d}.npy"))
            pd = np.asarray(pred["depth"], np.float32)
            if pd.shape != rendered_depth.shape:
                pd = np.asarray(
                    Image.fromarray(pd).resize(rendered_depth.shape[::-1]))
                mask = np.asarray(Image.fromarray(
                    pred["mask"].astype(np.uint8)).resize(rendered_depth.shape[::-1]))
            else:
                mask = np.asarray(pred["mask"], np.uint8)
            d_errs.append(normalized_depth_error(rendered_depth, pd, mask))
    out: Dict[str, float] = {"n_evaluated": float(n_imgs - n_skipped),
                             "n_skipped": float(n_skipped)}
    if a_errs:
        out["angle_error_mse"] = float(np.mean(a_errs))
    if d_errs:
        out["depth_error_mse"] = float(np.mean(d_errs))
    return out


def compute_consistency_dir(
    fake_dir: str, n_imgs: int, embed_fn: Callable[[np.ndarray], np.ndarray]
) -> Dict[str, float]:
    """Mean identity cosine similarity between the two views of each z
    (``compute_consistency.py:21-105``); ``embed_fn`` maps one HWC uint8
    image to an embedding vector (ArcFace in the reference)."""
    sims = []
    rgb_dir = os.path.join(fake_dir, "rgb")
    for i in range(n_imgs):
        a = np.asarray(Image.open(os.path.join(rgb_dir, f"{i:06d}_0.png")))
        b = np.asarray(Image.open(os.path.join(rgb_dir, f"{i:06d}_1.png")))
        sims.append(cosine_similarity(embed_fn(a), embed_fn(b)))
    return {"consistency_mean": float(np.mean(sims)), "consistency_std": float(np.std(sims))}

"""Camera-path rendering: single images, horizontal/vertical sweeps, videos,
and MPI plane sheets.

Capability parity with ``gmpi/eval/vis/render_video.py``: generate ONE MPI
(optionally plane-chunked), render a sweep of cameras through it, save
``rendered.png`` / ``mpi_{rgb,alpha,rgba}.png`` sheets, and rgb+depth mp4s
(imageio-ffmpeg when available, else a PNG frame directory).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from gmpi_tpu.config import ExperimentConfig
from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.core import poses as poses_mod
from gmpi_tpu.core.renderer import render_mpi_chunked
from gmpi_tpu.eval.generate import generate_mpi


def sweep_angles(cfg: ExperimentConfig, n_frames: int, horizontal: bool = True) -> np.ndarray:
    """±n_truncated_stds sweep around the pose mean (``render_video.py`` path
    construction)."""
    c = cfg.camera
    sweep = np.linspace(-c.n_truncated_stds, c.n_truncated_stds, n_frames)
    if horizontal:
        yaws = sweep * c.yaw_std + c.yaw_mean
        pitches = np.full(n_frames, c.pitch_mean)
    else:
        yaws = np.full(n_frames, c.yaw_mean)
        pitches = sweep * c.pitch_std + c.pitch_mean
    return np.stack([yaws, pitches], axis=1)


def render_camera_path(
    cfg: ExperimentConfig,
    params: dict,
    buffers: dict,
    seed: int = 0,
    n_frames: int = 100,
    horizontal: bool = True,
    n_planes: Optional[int] = None,
    img_size: Optional[int] = None,
    chunk_n_planes: int = -1,
    render_plane_chunk: Optional[int] = None,
    truncation_psi: float = 1.0,
    angles: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (frames [N,H,W,3] uint8, depth_frames [N,H,W] uint8,
    mpi [L,4,T,T] float)."""
    import dataclasses as _dc

    n_planes = n_planes or cfg.eval_n_planes
    img_size = img_size or cfg.resolution
    gen_cfg = cfg.generator_cfg()
    eval_cfg = _dc.replace(cfg, planes=_dc.replace(cfg.planes, n_planes=n_planes))
    geom = eval_cfg.plane_geometry()
    xyz_dict = cfg.multi_res_xyz(geom)
    intr = cam.intrinsics_from_fov(cfg.fov_deg, img_size, img_size)

    z = jax.random.normal(jax.random.key(seed), (1, cfg.train.z_dim), jnp.float32)
    mpi = generate_mpi(
        gen_cfg, params, buffers, z, xyz_dict, n_planes,
        chunk_n_planes=chunk_n_planes, truncation_psi=truncation_psi, noise_mode="const",
    )

    if angles is None:
        angles = sweep_angles(cfg, n_frames, horizontal)
    rchunk = render_plane_chunk or n_planes

    @jax.jit
    def render_one(yaw, pitch):
        c2w, _, _ = poses_mod.sample_sphere_poses(
            None, 1, cfg.camera, given_yaws=yaw.reshape(1, 1), given_pitches=pitch.reshape(1, 1)
        )
        ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
        out = render_mpi_chunked(
            mpi, geom.dhw, ray_dir, eye, z_dir, plane_chunk=rchunk,
            align_corners=cfg.planes.align_corners,
        )
        return out.color[0], out.depth[0, 0]

    frames, depths = [], []
    for yaw, pitch in angles:
        color, depth = render_one(jnp.float32(yaw), jnp.float32(pitch))
        frames.append(np.clip(np.asarray(color).transpose(1, 2, 0) * 255, 0, 255).astype(np.uint8))
        dn = (np.asarray(depth) - cfg.planes.min_d) / (cfg.planes.max_d - cfg.planes.min_d)
        depths.append((np.clip(dn, 0, 1) * 255).astype(np.uint8))
    return np.stack(frames), np.stack(depths), np.asarray(mpi[0])


def save_mpi_sheets(out_dir: str, mpi: np.ndarray, max_planes: int = 32) -> None:
    """Save concatenated per-plane rgb / alpha / rgba sheets
    (``render_video.py`` mpi_{rgb,alpha,rgba}.png)."""
    os.makedirs(out_dir, exist_ok=True)
    sel = np.linspace(0, mpi.shape[0] - 1, min(max_planes, mpi.shape[0])).astype(int)
    rgb = np.concatenate([mpi[i, :3].transpose(1, 2, 0) for i in sel], axis=1)
    alpha = np.concatenate([mpi[i, 3] for i in sel], axis=1)
    rgba_premult = np.concatenate(
        [(mpi[i, :3] * mpi[i, 3:4]).transpose(1, 2, 0) for i in sel], axis=1
    )
    Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(os.path.join(out_dir, "mpi_rgb.png"))
    Image.fromarray((np.clip(alpha, 0, 1) * 255).astype(np.uint8)).save(os.path.join(out_dir, "mpi_alpha.png"))
    Image.fromarray((np.clip(rgba_premult, 0, 1) * 255).astype(np.uint8)).save(
        os.path.join(out_dir, "mpi_rgba.png")
    )


def save_video(path: str, frames: np.ndarray, fps: int = 25) -> str:
    """mp4 via imageio-ffmpeg, falling back to a PNG frame directory."""
    try:
        import imageio

        imageio.mimwrite(path, list(frames), fps=fps, quality=8)
        return path
    except Exception:
        frame_dir = os.path.splitext(path)[0] + "_frames"
        os.makedirs(frame_dir, exist_ok=True)
        for i, fr in enumerate(frames):
            Image.fromarray(fr).save(os.path.join(frame_dir, f"{i:04d}.png"))
        return frame_dir


def render_video_artifacts(
    cfg: ExperimentConfig,
    params: dict,
    buffers: dict,
    out_dir: str,
    seed: int = 0,
    n_frames: int = 100,
    horizontal: bool = True,
    **kwargs,
) -> None:
    """Full ``render_video.py`` artifact set: rendered.png + sheets + mp4s."""
    os.makedirs(out_dir, exist_ok=True)
    frames, depths, mpi = render_camera_path(
        cfg, params, buffers, seed=seed, n_frames=n_frames, horizontal=horizontal, **kwargs
    )
    Image.fromarray(frames[len(frames) // 2]).save(os.path.join(out_dir, "rendered.png"))
    save_mpi_sheets(out_dir, mpi)
    save_video(os.path.join(out_dir, "rgb.mp4"), frames)
    save_video(os.path.join(out_dir, "depth.mp4"), np.repeat(depths[..., None], 3, axis=-1))

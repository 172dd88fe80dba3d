"""Training driver — the L6/L7 layers (``gmpi/train.py`` + ``launch.py``) as a
library function.

One process drives all local devices through a ``data`` mesh (SPMD replaces
the reference's one-process-per-GPU ``mp.spawn`` + DDP).  Responsibilities
mirrored from the reference step loop:

* config snapshot on start (``train.py:52-55``);
* warm start from a converted StyleGAN2/GMPI checkpoint (``train.py:197-230``);
* metric logging every 10 steps (``train.py:799-812``) — JSONL + stdout;
* image-grid snapshots every ``sample_interval`` (``train.py:815-994``);
* step-stamped checkpoints + rolling latest every ``model_save_interval``
  (``train.py:427-437, 997-1005``), with full resume (the reference cannot
  resume; we can);
* optional in-training FID every ``eval_freq`` given a feature extractor
  (``train.py:1009-1071``).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gmpi_tpu.config import ExperimentConfig
from gmpi_tpu.parallel.mesh import make_mesh
from gmpi_tpu.train.checkpoint import load_checkpoint, save_checkpoint, save_config_snapshot
from gmpi_tpu.train.step import TrainState, init_train_state, make_train_step


class MetricLogger:
    """Rank-0 metric log: JSONL + stdout + TensorBoard event file
    (``gmpi/utils/tensorboard_utils.py`` parity — live scalar dashboards
    via the dependency-free writer in ``utils/tb_writer.py``)."""

    def __init__(self, out_dir: str, tensorboard: bool = True):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            from gmpi_tpu.utils.tb_writer import SummaryWriter
            self._tb = SummaryWriter(os.path.join(out_dir, "tensorboard"))

    def log(self, step: int, metrics: dict) -> None:
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalars_dict(
                {k: float(v) for k, v in metrics.items()}, step)
        print(f"[step {step}] " + " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items()), flush=True)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def _to_u8(img_chw: np.ndarray) -> np.ndarray:
    return ((np.asarray(img_chw).transpose(1, 2, 0) + 1) / 2 * 255).clip(0, 255).astype(np.uint8)


def save_snapshot_grid(out_dir: str, cfg: ExperimentConfig, state: TrainState, step: int,
                       n_imgs: int = 4) -> None:
    """Training snapshots (``gmpi/train.py:815-994`` analogue): fixed /
    tilted / random view rows for the same fixed z's, for both EMA and raw
    generator weights, plus per-plane MPI rgb/alpha sheets for seed 0."""
    from PIL import Image

    from gmpi_tpu.eval.harness import FakeImageGenerator

    os.makedirs(out_dir, exist_ok=True)
    cam = cfg.camera
    tilt_yaw = cam.yaw_mean + 1.5 * cam.yaw_std
    tilt_pitch = cam.pitch_mean + 0.75 * cam.pitch_std
    for tag, params in (("ema", state.ema), ("raw", state.params_g)):
        gen = FakeImageGenerator(cfg, params, state.buffers_g,
                                 n_planes=cfg.planes.n_planes, img_size=cfg.hparams.img_size)
        mpis = [gen.sample_mpi(seed=i) for i in range(n_imgs)]
        rows = []
        for view in ("fixed", "tilted", "random"):
            cols = []
            for i in range(n_imgs):
                mpi = mpis[i]
                if view == "fixed":
                    yaws = np.array([[cam.yaw_mean]], np.float32)
                    pitches = np.array([[cam.pitch_mean]], np.float32)
                elif view == "tilted":
                    yaws = np.array([[tilt_yaw]], np.float32)
                    pitches = np.array([[tilt_pitch]], np.float32)
                else:
                    yaws, pitches = gen.sample_views(seed=1000 + i + step, n_views=1)
                imgs, _ = gen.render(mpi, jnp.asarray(yaws), jnp.asarray(pitches))
                cols.append(_to_u8(np.asarray(imgs)[0]))
            rows.append(np.concatenate(cols, axis=1))
        grid = np.concatenate(rows, axis=0)
        Image.fromarray(grid).save(os.path.join(out_dir, f"snap_{step:08d}_{tag}.png"))
        if tag == "ema":
            # MPI sheets: planes tiled horizontally (rgb in [0,1], alpha)
            mpi0 = np.asarray(mpis[0])[0]  # [L, 4, H, W]
            rgb = (np.concatenate(list(mpi0[:, :3].transpose(0, 2, 3, 1)), axis=1)
                   * 255).clip(0, 255).astype(np.uint8)
            alpha = (np.concatenate(list(mpi0[:, 3]), axis=1) * 255).clip(0, 255).astype(np.uint8)
            Image.fromarray(rgb).save(os.path.join(out_dir, f"mpi_{step:08d}_rgb.png"))
            Image.fromarray(alpha).save(os.path.join(out_dir, f"mpi_{step:08d}_alpha.png"))


def _check_pose_corner_rays(cfg: ExperimentConfig, img_size: int = 64) -> None:
    """Assert rays from the truncated pose-range corners hit the last plane
    (``assert_not_out_of_last_plane``, ``gmpi/core/mpi.py:103-128,381-395``)."""
    from gmpi_tpu.core import camera as cam_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import check_rays_hit_last_plane

    cam = cfg.camera
    n = cam.n_truncated_stds
    yaw_c = [cam.yaw_mean - n * cam.yaw_std, cam.yaw_mean + n * cam.yaw_std]
    pitch_c = [cam.pitch_mean - n * cam.pitch_std, cam.pitch_mean + n * cam.pitch_std]
    corners = [(y, p) for y in yaw_c for p in pitch_c]
    yaws = jnp.asarray([[y] for y, _ in corners])
    pitches = jnp.asarray([[p] for _, p in corners])
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, len(corners), cam, given_yaws=yaws, given_pitches=pitches)
    intr = cam_mod.intrinsics_from_fov(cfg.fov_deg, img_size, img_size)
    ray_dir, eye, z_dir = cam_mod.generate_rays(intr, c2w)
    geom = cfg.plane_geometry()
    dhw_last = jnp.broadcast_to(jnp.asarray(geom.dhw[-1]), (len(corners), 3))
    if not check_rays_hit_last_plane(dhw_last, eye, ray_dir, z_dir):
        raise RuntimeError(
            "pose-range corner rays miss the last plane — plane volume too "
            "small for the camera distribution (check plane/camera config)")


def train(
    cfg: ExperimentConfig,
    batches: Iterable,
    out_dir: str,
    total_iters: Optional[int] = None,
    resume: bool = True,
    init_params_g: Optional[dict] = None,
    init_buffers_g: Optional[dict] = None,
    init_params_d: Optional[dict] = None,
    seed: int = 123,
    sample_interval: int = 200,
    model_save_interval: int = 500,
    eval_freq: int = 5000,
    fid_feature_fn: Optional[Callable] = None,
    fid_real_images: Optional[np.ndarray] = None,
    snapshot_fn: Optional[Callable] = None,
    curriculum=None,
    rebuild_batches: Optional[Callable] = None,
) -> TrainState:
    """Run the GAN loop over ``batches`` (yielding ``(imgs, flat_pose, ...)``
    host arrays).  Returns the final state."""
    total_iters = total_iters or cfg.train.total_iters
    os.makedirs(out_dir, exist_ok=True)
    if jax.process_index() == 0:
        save_config_snapshot(out_dir, cfg)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    logger = MetricLogger(out_dir)

    # one-time geometric sanity: every ray from the truncated pose-range
    # corners must hit the last plane inside its extent
    # (``gmpi/core/mpi.py:381-395`` runs this every render; once at setup
    # suffices because the pose range and plane volume are static)
    _check_pose_corner_rays(cfg)

    state = init_train_state(cfg, jax.random.key(seed))
    # startup introspection (``misc.print_module_summary`` analogue)
    from gmpi_tpu.utils.inspect import param_summary

    _, n_g = param_summary(state.params_g)
    _, n_d = param_summary(state.params_d)
    print(f"[model] generator params: {n_g:,}  discriminator params: {n_d:,}", flush=True)
    # warm start (``train.py:197-230``): partial name-matched absorption
    if init_params_g is not None:
        state = state._replace(
            params_g=init_params_g,
            ema=jax.tree_util.tree_map(jnp.copy, init_params_g),
            ema2=jax.tree_util.tree_map(jnp.copy, init_params_g),
        )
    if init_buffers_g is not None:
        state = state._replace(buffers_g=init_buffers_g)
    if init_params_d is not None:
        state = state._replace(params_d=init_params_d)
    if resume and os.path.exists(os.path.join(ckpt_dir, "latest")):
        state = load_checkpoint(ckpt_dir, state)
        print(f"resumed from step {int(np.asarray(state.step))}", flush=True)

    # device layout: a renderer mesh (plane x tile sharding of every
    # full-res render — the FFHQ1024 memory axis) when configured, else a
    # data mesh over as many devices as divide the batch
    import math

    rp = max(cfg.train.renderer_plane_shards, 1)
    rt = max(cfg.train.renderer_tile_shards, 1)
    renderer_mesh = None
    if rp > 1 or rt > 1:
        devs = jax.devices()
        assert rp * rt <= len(devs), (rp, rt, len(devs))
        renderer_mesh = make_mesh([rp, rt], ("plane", "tile"),
                                  devices=devs[: rp * rt])

    def data_shardings(batch_size):
        if renderer_mesh is not None:
            # params AND batch replicated: every chip renders its plane slab
            # / pixel rows of the whole batch (DP composes across hosts)
            repl_ = NamedSharding(renderer_mesh, P())
            return repl_, repl_
        devs = jax.devices()
        n_data = math.gcd(len(devs), batch_size)
        mesh = make_mesh([n_data], ("data",), devices=devs[:n_data])
        return NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))

    repl, batch_sh = data_shardings(cfg.hparams.batch_size)
    state = jax.device_put(state, repl)

    # curriculum: each stage boundary rebuilds the jitted step (resolution /
    # batch changes are recompile events — static jit shapes) and optionally
    # the data iterator (``curriculums.py:50-85``, ``train.py:360-410``)
    from gmpi_tpu.curriculum import apply_to_config

    step0 = int(np.asarray(state.step))
    stage_cfg = apply_to_config(cfg, curriculum.at_step(step0)) if curriculum else cfg
    step_fn = make_train_step(stage_cfg, mesh=renderer_mesh)
    next_boundary = curriculum.next_upsample_step(step0) if curriculum else float("inf")
    if stage_cfg.hparams.batch_size != cfg.hparams.batch_size:
        repl, batch_sh = data_shardings(stage_cfg.hparams.batch_size)
        state = jax.device_put(state, repl)

    rng = jax.random.key(seed + 1)
    t_start = time.time()
    batch_iter = iter(batches)
    while True:
        step = int(np.asarray(state.step))
        if step >= total_iters:
            break
        if curriculum is not None and step >= next_boundary:
            entry = curriculum.at_step(step)
            stage_cfg = apply_to_config(cfg, entry)
            step_fn = make_train_step(stage_cfg, mesh=renderer_mesh)
            next_boundary = curriculum.next_upsample_step(step)
            repl, batch_sh = data_shardings(stage_cfg.hparams.batch_size)
            state = jax.device_put(state, repl)
            print(f"[curriculum] stage change at step {step}: {entry}", flush=True)
            if rebuild_batches is not None:
                # replace the iterator itself — a `for` loop would keep
                # draining the captured stage-1 iterator
                batch_iter = iter(rebuild_batches(entry))
        try:
            batch = next(batch_iter)
        except StopIteration:
            break
        imgs, flat_pose = batch[0], batch[1]
        imgs = jax.device_put(jnp.asarray(imgs, jnp.float32), batch_sh)
        flat_pose = jax.device_put(jnp.asarray(flat_pose, jnp.float32), batch_sh)
        rng, step_rng = jax.random.split(rng)
        state, metrics = step_fn(state, imgs, flat_pose, step_rng)

        if step % 10 == 0:
            metrics = {**metrics, "steps_per_s": (step + 1) / (time.time() - t_start)}
            logger.log(step, metrics)
        if step > 0 and step % sample_interval == 0:
            (snapshot_fn or save_snapshot_grid)(os.path.join(out_dir, "snaps"), stage_cfg, state, step)
        if step > 0 and step % model_save_interval == 0:
            # collective: all processes enter (orbax syncs; primary commits)
            save_checkpoint(ckpt_dir, state)
        if fid_feature_fn is not None and fid_real_images is not None and step > 0 and step % eval_freq == 0:
            fid = compute_training_fid(stage_cfg, state, fid_feature_fn, fid_real_images)
            logger.log(step, {"fid": fid})

    save_checkpoint(ckpt_dir, state)
    logger.close()
    return state


def compute_training_fid(
    cfg: ExperimentConfig,
    state: TrainState,
    feature_fn: Callable[[np.ndarray], np.ndarray],
    real_images: np.ndarray,
    n_imgs: Optional[int] = None,
    batch: int = 8,
) -> float:
    """In-training FID with EMA weights (``gmpi/fid_evaluation.py:38-145``)."""
    from gmpi_tpu.eval.harness import FakeImageGenerator
    from gmpi_tpu.eval.metrics import fid_from_features

    n_imgs = n_imgs or len(real_images)
    gen = FakeImageGenerator(cfg, state.ema, state.buffers_g,
                             n_planes=cfg.planes.n_planes, img_size=cfg.hparams.img_size)
    fakes = []
    for i in range(0, n_imgs, batch):
        b = min(batch, n_imgs - i)
        mpi = gen.sample_mpi(seed=i, batch=b)
        yaws, pitches = gen.sample_views(seed=i, n_views=b)
        imgs, _ = gen.render(mpi, yaws, pitches)
        fakes.append(((np.asarray(imgs) + 1) / 2).clip(0, 1))
    fake_feats = feature_fn(np.concatenate(fakes))
    real_feats = feature_fn(((real_images + 1) / 2).clip(0, 1) if real_images.min() < 0 else real_images)
    return fid_from_features(fake_feats, real_feats)

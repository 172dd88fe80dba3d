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
    """Rank-0 JSONL metric log + stdout (TensorBoard analogue,
    ``gmpi/utils/tensorboard_utils.py``)."""

    def __init__(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self._f = open(self.path, "a")

    def log(self, step: int, metrics: dict) -> None:
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        print(f"[step {step}] " + " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items()), flush=True)

    def close(self):
        self._f.close()


def save_snapshot_grid(out_dir: str, cfg: ExperimentConfig, state: TrainState, step: int,
                       n_imgs: int = 4, use_ema: bool = True) -> None:
    """Fixed-seed image grid (EMA weights), the ``train.py:815-994`` analogue."""
    from PIL import Image

    from gmpi_tpu.eval.harness import FakeImageGenerator

    params = state.ema if use_ema else state.params_g
    gen = FakeImageGenerator(cfg, params, state.buffers_g,
                             n_planes=cfg.planes.n_planes, img_size=cfg.hparams.img_size)
    rows = []
    for i in range(n_imgs):
        mpi = gen.sample_mpi(seed=i)
        yaws, pitches = gen.sample_views(seed=1000 + i, n_views=1)
        imgs, _ = gen.render(mpi, yaws, pitches)
        rows.append(((np.asarray(imgs)[0].transpose(1, 2, 0) + 1) / 2 * 255).clip(0, 255).astype(np.uint8))
    grid = np.concatenate(rows, axis=1)
    os.makedirs(out_dir, exist_ok=True)
    Image.fromarray(grid).save(os.path.join(out_dir, f"snap_{step:08d}.png"))


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
) -> TrainState:
    """Run the GAN loop over ``batches`` (yielding ``(imgs, flat_pose, ...)``
    host arrays).  Returns the final state."""
    total_iters = total_iters or cfg.train.total_iters
    os.makedirs(out_dir, exist_ok=True)
    save_config_snapshot(out_dir, cfg)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    logger = MetricLogger(out_dir)

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

    # data mesh over as many devices as divide the batch
    import math

    devs = jax.devices()
    n_data = math.gcd(len(devs), cfg.hparams.batch_size)
    mesh = make_mesh([n_data], ("data",), devices=devs[:n_data])
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    state = jax.device_put(state, repl)
    step_fn = make_train_step(cfg)

    rng = jax.random.key(seed + 1)
    t_start = time.time()
    for batch in batches:
        step = int(np.asarray(state.step))
        if step >= total_iters:
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
            (snapshot_fn or save_snapshot_grid)(os.path.join(out_dir, "snaps"), cfg, state, step)
        if step > 0 and step % model_save_interval == 0:
            save_checkpoint(ckpt_dir, state)
        if fid_feature_fn is not None and fid_real_images is not None and step > 0 and step % eval_freq == 0:
            fid = compute_training_fid(cfg, state, fid_feature_fn, fid_real_images)
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

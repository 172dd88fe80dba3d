"""The GAN training engine — pure, jitted, mesh-shardable train step.

Re-designs the reference step loop (``gmpi/train.py:462-785``) as one pure
function ``train_step(state, batch, rng) -> (state, metrics)``:

* **D phase** (``train.py:462-625``): sample z, synthesize MPIs (no grad
  to G), optional lighting augmentation, render into truncated-gaussian
  poses, score real images (with R1 via grad-of-grad) and fakes, Adam update
  with global-norm clip.
* **G phase** (``train.py:627-785``): fresh z, *worst-view selection* — render
  ``n_view_per_z`` candidate views per z without grad and keep the view with
  the lowest D score (``train_helpers.find_worst_view_per_z``,
  ``train_helpers.py:131-237``) — then differentiate through synth + lighting
  + renderer + D at the chosen views.
* dual generator EMA (0.999 / 0.9999, ``train.py:194-195, 784-785``) and the
  mapping ``w_avg`` running average.

Micro-batching: ``batch_split`` gradient accumulation (``train.py:630-635``)
is expressed as a statically-unrolled loop inside the traced function, so XLA
sees the full step.  Multi-chip: the returned step is ``jax.jit``-ed with
batch-sharded inputs over a ``data`` mesh axis — gradient psum is inserted by
XLA from the shardings (replacing DDP allreduce).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gmpi_tpu.config import ExperimentConfig
from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.core import poses as poses_mod
from gmpi_tpu.core.lighting import LightingConfig, light_mpi
from gmpi_tpu.core.renderer import render_mpi, render_mpi_chunked
from gmpi_tpu.train.losses import d_gan_loss, g_gan_loss, r1_penalty


class TrainState(NamedTuple):
    params_g: dict
    buffers_g: dict  # noise consts + mapping w_avg
    params_d: dict
    opt_g: optax.OptState
    opt_d: optax.OptState
    ema: dict  # EMA of params_g, decay .999
    ema2: dict  # decay .9999
    step: jnp.ndarray  # scalar int32


def make_optimizers(cfg: ExperimentConfig):
    """Adam with global-norm clipping; the mapping network runs at
    ``lr * 0.05`` (``train.py:377-387``) via a label-partitioned transform."""
    t = cfg.train
    h = cfg.hparams

    def adam(lr):
        return optax.chain(
            optax.clip_by_global_norm(t.grad_clip),
            optax.adam(lr, b1=t.betas[0], b2=t.betas[1]),
        )

    def label_fn(params):
        return {k: ("mapping" if k == "mapping" else "rest") for k in params}

    opt_g = optax.multi_transform(
        {"mapping": adam(h.gen_lr * t.mapping_lr_mult), "rest": adam(h.gen_lr)},
        label_fn,
    )
    opt_d = adam(h.disc_lr)
    return opt_g, opt_d


def init_train_state(cfg: ExperimentConfig, key: jax.Array) -> TrainState:
    gen_cfg = cfg.generator_cfg()
    disc_cfg = cfg.discriminator_cfg()
    kg, kd = jax.random.split(key)
    params_g, buffers_g = gen_cfg.init(kg)
    params_d = disc_cfg.init(kd)
    opt_g, opt_d = make_optimizers(cfg)
    return TrainState(
        params_g=params_g,
        buffers_g=buffers_g,
        params_d=params_d,
        opt_g=opt_g.init(params_g),
        opt_d=opt_d.init(params_d),
        ema=jax.tree_util.tree_map(jnp.copy, params_g),
        ema2=jax.tree_util.tree_map(jnp.copy, params_g),
        step=jnp.zeros((), jnp.int32),
    )


def flat_pose_from_c2w(c2w: jnp.ndarray, pose_dim: int) -> jnp.ndarray:
    """D conditioning vector: flattened w2c (16) or its rotation block (9)
    (``train.py:568-575``)."""
    if pose_dim == 16:
        w2c = jnp.linalg.inv(c2w)
        return w2c.reshape(c2w.shape[0], 16)
    if pose_dim == 9:
        w2c_rot = jnp.linalg.inv(c2w[:, :3, :3])
        return w2c_rot.reshape(c2w.shape[0], 9)
    raise ValueError(pose_dim)


def _ema_update(ema: dict, params: dict, decay: float) -> dict:
    return jax.tree_util.tree_map(lambda e, p: decay * e + (1.0 - decay) * p, ema, params)


def make_train_step(cfg: ExperimentConfig, donate: bool = True,
                    mesh=None, return_grads: bool = False):
    """Build the jitted train step for a preset.  All geometry (plane volume,
    conditioning grids, camera rays basis) is computed host-side once and
    closed over as constants.

    ``mesh``: a ``jax.sharding.Mesh`` with a ``"plane"`` (and optionally
    ``"tile"``) axis routes every full-resolution render through the
    multi-chip sharded renderer (``parallel/render.py``) with params and
    batch replicated — each chip warps/splats only its plane slab, dropping
    per-chip renderer residuals ~n_plane x (the memory axis that lets
    FFHQ1024 train on 16 GB chips; the reference's equivalent capability is
    8x 32 GB V100 DDP, ``docs/TRAIN_EVAL.md:152``).  The G/D phases run
    replicated exactly as in the single-device step.

    ``return_grads``: the step additionally returns the raw D/G gradient
    pytrees (test hook — the sharded-vs-single-device allclose gate).
    """
    gen_cfg = cfg.generator_cfg()
    disc_cfg = cfg.discriminator_cfg()
    geom = cfg.plane_geometry()
    xyz_dict = cfg.multi_res_xyz(geom)
    intr = cam.intrinsics_from_fov(cfg.fov_deg, cfg.hparams.img_size, cfg.hparams.img_size)
    t = cfg.train
    n_planes = cfg.planes.n_planes
    align_corners = cfg.planes.align_corners
    light_cfg = LightingConfig(
        sphere_center_z=cfg.camera.sphere_center_z,
        sphere_r=cfg.camera.sphere_r,
        ka_max=t.lighting_max_ka,
        kd_max=t.lighting_max_kd,
        n_grow_iters=t.lighting_grow_n_iters,
    )
    xyz_last_plane = geom_mod.plane_xyz_grid(geom, cfg.hparams.tex_size, cfg.hparams.tex_size)[-1]
    opt_g, opt_d = make_optimizers(cfg)
    batch_split = cfg.hparams.batch_split
    # static warp bands for the tile-banded MXU warp (None -> gather path)
    from gmpi_tpu.core.bands import bands_for_config

    tiled_bands = bands_for_config(cfg)
    fused_plans = None
    use_fused = t.use_fused_renderer
    if use_fused is None:
        # auto: the fused Pallas kernel is the production path on TPU (BENCH
        # gates it vs the gather oracle every round); non-TPU backends keep
        # the portable path (the kernels are Pallas-TPU — pltpu grid specs /
        # SMEM / async copies do not lower on CPU or GPU)
        on_tpu = jax.default_backend() == "tpu" or any(
            d.platform == "tpu" for d in jax.devices())
        use_fused = (
            on_tpu
            and align_corners
            and cfg.hparams.img_size % 64 == 0
        )
    if use_fused:
        from gmpi_tpu.core.bands import fused_plans_for_config

        assert align_corners, (
            "use_fused_renderer requires planes.align_corners=True "
            "(the fused kernel's coordinate convention)")
        fused_plans = fused_plans_for_config(cfg)

    # -- multi-chip sharded renderer (plane / plane x tile mesh) -----------
    shard_planes = shard_tiles = 1
    if mesh is not None:
        ax = dict(zip(mesh.axis_names, mesh.devices.shape))
        shard_planes = ax.get("plane", 1)
        shard_tiles = ax.get("tile", 1)
    use_sharded_renderer = shard_planes > 1 or shard_tiles > 1
    slab_fn = None
    if use_sharded_renderer:
        assert n_planes % max(shard_planes, 1) == 0, (n_planes, shard_planes)
        assert cfg.hparams.img_size % max(shard_tiles, 1) == 0, (
            cfg.hparams.img_size, shard_tiles)
        if fused_plans is not None:
            # SPMD: one fused slab kernel shared by all plane shards — its
            # static bands are the union over the full plane range
            from gmpi_tpu.core.bands import fused_slab_plan_for_config
            from gmpi_tpu.ops.pallas_warp import make_fused_slab_renderer

            slab_bands, slab_splat = fused_slab_plan_for_config(cfg)
            cd_s = jnp.bfloat16 if t.fused_compute_dtype == "bf16" else None
            assert (cfg.hparams.img_size // max(shard_tiles, 1)) % 16 == 0
            slab_fn = make_fused_slab_renderer(
                tuple(slab_bands), tuple(slab_splat),
                cfg.hparams.tex_size, cfg.hparams.tex_size,
                precision="bf16x3", compute_dtype=cd_s)

    def render_views_sharded(mpi, ray_dir, eye, z_dir):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gmpi_tpu.parallel.render import (render_mpi_plane_sharded,
                                              render_mpi_plane_tile_sharded,
                                              render_mpi_tile_sharded)

        bands2 = tiled_bands[:2] if tiled_bands is not None else None
        if shard_planes > 1 and shard_tiles > 1:
            out = render_mpi_plane_tile_sharded(
                mesh, mpi, geom.dhw, ray_dir, eye, z_dir,
                align_corners=align_corners, tiled_bands=bands2,
                slab_fn=slab_fn)
        elif shard_planes > 1:
            out = render_mpi_plane_sharded(
                mesh, mpi, geom.dhw, ray_dir, eye, z_dir,
                align_corners=align_corners, tiled_bands=bands2,
                slab_fn=slab_fn)
        else:
            render_fn = None
            if fused_plans is not None:
                from gmpi_tpu.core.renderer import render_mpi_fused

                cd_t = jnp.bfloat16 if t.fused_compute_dtype == "bf16" else None
                render_fn = lambda r, d, rd, e, z: render_mpi_fused(
                    r, d, rd, e, z, fused_plans, compute_dtype=cd_t,
                    with_disp=False)
            out = render_mpi_tile_sharded(
                mesh, mpi, geom.dhw, ray_dir, eye, z_dir,
                align_corners=align_corners, tiled_bands=bands2,
                render_fn=render_fn)
        # Re-replicate the rendered images before they reach D: (a) running
        # D row-sharded would pay a halo exchange per conv for no memory win
        # (the image is tiny next to the renderer residuals this mode
        # shards), and (b) jit'd param-grads of a computation whose input
        # stays sharded on ONE axis of a 2-D mesh come back scaled by 1/n of
        # the orthogonal axis on jax 0.9.0's CPU SPMD partitioner (losses
        # correct, weight grads 4x low on a (4, 2) mesh — pinned by
        # tests/test_train_sharded.py, which fails loudly without this).
        repl = NamedSharding(mesh, P())
        constrain = lambda x: (None if x is None
                               else jax.lax.with_sharding_constraint(x, repl))
        from gmpi_tpu.core.renderer import RenderOutput

        return RenderOutput(color=constrain(out.color),
                            depth=constrain(out.depth),
                            disp=constrain(out.disp))

    def synth(params_g, buffers_g, z, rng, stop_all_grad=False):
        mpi = gen_cfg.apply(
            params_g, buffers_g, z, None, xyz_dict, n_planes,
            truncation_psi=t.truncation_psi,
            noise_mode="random", rng=rng,
            stop_mapping_grad=not t.train_mapping,
            stop_trunk_grad=not t.train_trunk,
        )
        return jax.lax.stop_gradient(mpi) if stop_all_grad else mpi

    def maybe_light(mpi, step, rng):
        if not t.aug_with_lighting:
            return mpi
        lit = light_mpi(light_cfg, mpi, geom.dhw, xyz_last_plane,
                        jnp.clip(step - t.lighting_start_iter, 0, None), rng)
        return jnp.where(step > t.lighting_start_iter, lit, mpi)

    def render_views(mpi, yaws, pitches, with_depth=False, low_res=0):
        """Render each MPI into its camera; returns imgs in [-1,1] + flat pose.

        ``low_res > 0``: render at that resolution through the portable
        gather path and bilinearly upsample to ``img_size`` — the cheap
        no-grad mode of worst-view selection (candidates only need to be
        *rankable* by D, not crisp)."""
        c2w, _, _ = poses_mod.sample_sphere_poses(
            None, mpi.shape[0], cfg.camera, given_yaws=yaws, given_pitches=pitches
        )
        if low_res:
            intr_lo = cam.intrinsics_from_fov(cfg.fov_deg, low_res, low_res)
            ray_dir, eye, z_dir = cam.generate_rays(intr_lo, c2w)
            out = render_mpi(mpi, geom.dhw, ray_dir, eye, z_dir, align_corners)
        else:
            ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
            if use_sharded_renderer:
                out = render_views_sharded(mpi, ray_dir, eye, z_dir)
            elif fused_plans is not None:
                from gmpi_tpu.core.renderer import (render_mpi_fused,
                                                    render_mpi_fused_remat)

                cd = jnp.bfloat16 if t.fused_compute_dtype == "bf16" else None
                render = (render_mpi_fused_remat if t.fused_remat
                          else render_mpi_fused)
                out = render(mpi, geom.dhw, ray_dir, eye, z_dir,
                             fused_plans, compute_dtype=cd, with_disp=False)
            elif t.renderer_plane_chunk:
                out = render_mpi_chunked(
                    mpi, geom.dhw, ray_dir, eye, z_dir,
                    plane_chunk=t.renderer_plane_chunk,
                    align_corners=align_corners, tiled_bands=tiled_bands,
                    with_disp=False,
                )
            else:
                out = render_mpi(mpi, geom.dhw, ray_dir, eye, z_dir, align_corners,
                                 tiled_bands=tiled_bands)
        color = out.color
        if t.debug_ray_check:
            from gmpi_tpu.core.renderer import poison_if_rays_escape

            color = poison_if_rays_escape(color, geom.dhw[-1], eye, ray_dir,
                                          z_dir, align_corners)
        if low_res:
            color = jax.image.resize(
                color, (*color.shape[:2], cfg.hparams.img_size, cfg.hparams.img_size),
                method="bilinear")
        imgs = color * 2.0 - 1.0  # ``mpi_renderer.py:467``
        flat_pose = flat_pose_from_c2w(c2w, t.d_cond_pose_dim) if t.d_cond_on_pose else None
        if with_depth:
            return imgs, flat_pose, out.depth
        return imgs, flat_pose

    def sample_views(rng, n):
        yaws, pitches = poses_mod.sample_yaw_pitch(rng, n, cfg.camera)
        return yaws, pitches

    def d_apply(params_d, imgs, flat_pose):
        return disc_cfg.apply(params_d, imgs, flat_pose)

    # -- D phase -------------------------------------------------------------

    def d_phase(state: TrainState, real_imgs, real_pose, rng):
        rng_z, rng_noise, rng_light, rng_pose = jax.random.split(rng, 4)
        bs = real_imgs.shape[0]
        z = jax.random.normal(rng_z, (bs, t.z_dim), jnp.float32)
        yaws, pitches = sample_views(rng_pose, bs)

        # fake generation is no-grad; micro-batching it bounds the live
        # plane-stack memory exactly as the reference's D-phase batch_split
        # does (``gmpi/train.py:503-518``).  Identical math either way —
        # each z's MPI/render is independent.
        d_split = batch_split if (t.d_batch_split and bs % batch_split == 0) else 1
        mbs_d = bs // d_split
        fake_parts, pose_parts = [], []
        noise_keys = jax.random.split(rng_noise, d_split)
        light_keys = jax.random.split(rng_light, d_split)
        for s in range(d_split):
            sl = slice(s * mbs_d, (s + 1) * mbs_d)
            mpi = synth(state.params_g, state.buffers_g, z[sl], noise_keys[s],
                        stop_all_grad=True)
            mpi = maybe_light(mpi, state.step, light_keys[s])
            fi, fp = render_views(mpi, yaws[sl], pitches[sl])
            fake_parts.append(fi)
            pose_parts.append(fp)
        fake_imgs = jax.lax.stop_gradient(jnp.concatenate(fake_parts, axis=0))
        fake_pose = (None if pose_parts[0] is None
                     else jnp.concatenate(pose_parts, axis=0))

        # R1 differentiates D twice w.r.t. the real images; rematerializing
        # D's activations inside that grad halves the double-backprop's live
        # memory at 1024² for one extra D forward
        d_for_r1 = jax.checkpoint(d_apply) if t.r1_remat else d_apply

        def d_loss_fn(params_d):
            r_scores = d_apply(params_d, real_imgs, real_pose)
            f_scores = d_apply(params_d, fake_imgs, fake_pose)
            loss_real, loss_fake = d_gan_loss(r_scores, f_scores)
            r1 = r1_penalty(lambda im: d_for_r1(params_d, im, real_pose), real_imgs, t.r1_lambda)
            return loss_real + loss_fake + r1, (loss_real, loss_fake, r1)

        (d_loss, (loss_real, loss_fake, r1)), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state.params_d)
        metrics = {"d_loss": d_loss, "d_loss_real": loss_real, "d_loss_fake": loss_fake, "r1": r1}
        if not t.train_d:  # frozen D: losses reported, no update
            return state, metrics, grads
        updates, new_opt_d = opt_d.update(grads, state.opt_d, state.params_d)
        new_params_d = optax.apply_updates(state.params_d, updates)
        return state._replace(params_d=new_params_d, opt_d=new_opt_d), metrics, grads

    # -- G phase -------------------------------------------------------------

    def worst_views(state: TrainState, z, rng):
        """Per-z hardest camera among ``n_view_per_z`` candidates
        (``train_helpers.py:131-237``)."""
        rng_noise, rng_pose = jax.random.split(rng)
        bs = z.shape[0]
        v = t.n_view_per_z
        mpi = synth(state.params_g, state.buffers_g, z, rng_noise, stop_all_grad=True)
        mpi_rep = jnp.repeat(mpi, v, axis=0)  # z-major: [z0v0, z0v1, ...]
        yaws, pitches = sample_views(rng_pose, bs * v)
        imgs, flat_pose = render_views(mpi_rep, yaws, pitches,
                                       low_res=t.worst_view_render_res)
        scores = d_apply(state.params_d, imgs, flat_pose).reshape(bs, v)
        idx = jnp.argmin(scores, axis=1)  # lowest D score = hardest view
        sel = idx + jnp.arange(bs) * v
        return yaws[sel], pitches[sel]

    def g_phase(state: TrainState, rng, bs):
        rng_z, rng_worst, rng_noise, rng_light, rng_pose = jax.random.split(rng, 5)
        z = jax.random.normal(rng_z, (bs, t.z_dim), jnp.float32)

        if t.n_view_per_z > 1 and t.select_worst_view:
            yaws, pitches = worst_views(state, z, rng_worst)
        else:
            yaws, pitches = sample_views(rng_pose, bs)

        mbs = bs // batch_split
        assert bs % batch_split == 0, (bs, batch_split)

        def g_loss_fn(params_g):
            total = 0.0
            noise_keys = jax.random.split(rng_noise, batch_split)
            light_keys = jax.random.split(rng_light, batch_split)
            for s in range(batch_split):
                sl = slice(s * mbs, (s + 1) * mbs)
                mpi = synth(params_g, state.buffers_g, z[sl], noise_keys[s])
                mpi = maybe_light(mpi, state.step, light_keys[s])
                imgs, flat_pose, depth = render_views(mpi, yaws[sl], pitches[sl], with_depth=True)
                scores = d_apply(state.params_d, imgs, flat_pose)
                loss_s = g_gan_loss(scores)
                if t.use_edge_aware_loss:
                    from gmpi_tpu.utils.img import edge_aware_smooth_loss

                    loss_s = loss_s + t.edge_aware_loss_w * edge_aware_smooth_loss(
                        imgs, depth, t.edge_aware_loss_e_min, t.edge_aware_loss_g_min
                    )
                total = total + loss_s / batch_split
            return total

        g_loss, grads = jax.value_and_grad(g_loss_fn)(state.params_g)
        updates, new_opt_g = opt_g.update(grads, state.opt_g, state.params_g)
        new_params_g = optax.apply_updates(state.params_g, updates)

        # w_avg running mean (the reference updates it inside every training
        # forward; one update per step is the jit-friendly equivalent)
        ws = gen_cfg.mapping.apply(new_params_g["mapping"], state.buffers_g["mapping"], z, None)
        new_w_avg = gen_cfg.mapping.updated_w_avg(state.buffers_g["mapping"], ws)
        new_buffers = dict(state.buffers_g)
        new_buffers["mapping"] = dict(state.buffers_g["mapping"], w_avg=new_w_avg)

        new_state = state._replace(
            params_g=new_params_g,
            buffers_g=new_buffers,
            opt_g=new_opt_g,
            ema=_ema_update(state.ema, new_params_g, t.ema_decay),
            ema2=_ema_update(state.ema2, new_params_g, t.ema2_decay),
        )
        return new_state, {"g_loss": g_loss}, grads

    # -- full step -----------------------------------------------------------

    def train_step(state: TrainState, real_imgs, real_pose, rng):
        """One D update + one G update.  ``real_imgs`` in [-1, 1],
        ``real_pose`` the dataset's flat w2c conditioning vector."""
        rng_d, rng_g = jax.random.split(rng)
        state, d_metrics, grads_d = d_phase(state, real_imgs, real_pose, rng_d)
        # G updates per D update (``G_iters``, ``train.py:637``)
        for gi in range(t.g_iters):
            state, g_metrics, grads_g = g_phase(
                state, jax.random.fold_in(rng_g, gi), real_imgs.shape[0])
        state = state._replace(step=state.step + 1)
        metrics = {**d_metrics, **g_metrics}
        if return_grads:
            return state, metrics, {"d": grads_d, "g": grads_g}
        return state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())

"""Per-chip memory proof for plane-sharded FFHQ1024 training, on the v5e.

VERDICT r4 #1(c): replace the "96 planes over 8 chips ~ 200 MB/chip" prose
with compiled numbers.  Only one chip exists, so this compiles the
PER-CHIP-EQUIVALENT computation of the 8-way ``("plane", "tile")`` sharded
step (``make_train_step(mesh=...)``) with real TPU buffer assignment:

* G synthesis, worst-view selection (low-res), D with R1 (remat), Adam +
  dual EMA run REPLICATED on every chip — identical to one chip's share;
* the renderer runs the fused slab kernel over L/n_plane planes for
  H/n_tile rows (the chip's slab), then over-combines with n_plane-1
  incoming image-sized partials (stand-ins for the ICI butterfly's
  operands — memory-equivalent, gradient-equivalent for the local slab).

If this compiles under 16 GB, the sharded step fits; ``memory_analysis``
gives the margin.  Reference capability being matched: FFHQ1024 training
on 8x 32 GB V100 DDP (``docs/TRAIN_EVAL.md:152``).

Default batch 2 / batch_split 2: the per-MICROBATCH working set (micro=1)
is identical to the production batch 4 / split 4 config — gradient
accumulation replays the same buffers — and the 4-way unrolled graph
crashed the remote compile helper outright.  Batch 4 adds ~2x on the
D-phase activations only (R1 runs rematerialized).

    python tools/tpu_memcheck_1024.py [--plane_shards 8] [--tile_shards 1]
"""

import argparse
import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plane_shards", type=int, default=8)
    ap.add_argument("--tile_shards", type=int, default=1)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--batch_split", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from gmpi_tpu.config import get_config
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.bands import fused_slab_plan_for_config
    from gmpi_tpu.core.renderer import combine_segments
    from gmpi_tpu.ops.pallas_warp import make_fused_slab_renderer
    from gmpi_tpu.train.losses import d_gan_loss, g_gan_loss, r1_penalty
    from gmpi_tpu.train.step import (flat_pose_from_c2w, init_train_state,
                                     make_optimizers)
    from gmpi_tpu.core.renderer import render_mpi

    cfg = get_config("FFHQ1024")
    cfg = dataclasses.replace(
        cfg,
        hparams=dataclasses.replace(cfg.hparams, batch_size=args.batch,
                                    batch_split=args.batch_split),
        train=dataclasses.replace(cfg.train, worst_view_render_res=256,
                                  r1_remat=True, aug_with_lighting=False),
    )
    t = cfg.train
    res = cfg.hparams.img_size
    n_planes = cfg.planes.n_planes
    l_shard = n_planes // args.plane_shards
    rows = res // args.tile_shards
    geom = cfg.plane_geometry()
    xyz_dict = cfg.multi_res_xyz(geom)
    gen_cfg = cfg.generator_cfg()
    disc_cfg = cfg.discriminator_cfg()
    intr = cam.intrinsics_from_fov(cfg.fov_deg, res, res)
    opt_g, opt_d = make_optimizers(cfg)

    slab_bands, slab_splat = fused_slab_plan_for_config(cfg)
    slab_fn = make_fused_slab_renderer(
        tuple(slab_bands), tuple(slab_splat),
        cfg.hparams.tex_size, cfg.hparams.tex_size, precision="bf16x3")

    def render_local(mpi, yaws, pitches):
        """One chip's share: fused slab over l_shard planes for `rows`
        pixel rows + combine with (plane_shards - 1) incoming partials."""
        c2w, _, _ = poses_mod.sample_sphere_poses(
            None, mpi.shape[0], cfg.camera, given_yaws=yaws,
            given_pitches=pitches)
        ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
        ray_rows = ray_dir[:, :, :rows]
        part = slab_fn(mpi[:, :l_shard], geom.dhw[:l_shard],
                       ray_rows, eye, z_dir)
        v = mpi.shape[0]
        for k in range(args.plane_shards - 1):
            incoming = (
                jnp.full((v, 3, rows, res), 0.3 + 0.01 * k),
                jnp.full((v, 1, rows, res), 1.0),
                jnp.full((v, 1, rows, res), 0.5),
            )
            part = combine_segments(part, incoming)
        color = jnp.broadcast_to(
            part[0][:, :, :1], (v, 3, res, res)
        ) if args.tile_shards > 1 else part[0]
        # re-replicated image reaches D at full res (the all-gather's
        # memory is the full image — modeled by the broadcast above)
        imgs = color * 2.0 - 1.0
        return imgs, flat_pose_from_c2w(c2w, t.d_cond_pose_dim)

    def synth(params_g, buffers_g, z, rng, stop=False):
        mpi = gen_cfg.apply(params_g, buffers_g, z, None, xyz_dict, n_planes,
                            truncation_psi=1.0, noise_mode="random", rng=rng)
        return jax.lax.stop_gradient(mpi) if stop else mpi

    def worst_views(state, z, rng):
        rng_n, rng_p = jax.random.split(rng)
        bs, v = z.shape[0], t.n_view_per_z
        mpi = synth(state.params_g, state.buffers_g, z, rng_n, stop=True)
        mpi_rep = jnp.repeat(mpi, v, axis=0)
        yaws, pitches = poses_mod.sample_yaw_pitch(rng_p, bs * v, cfg.camera)
        lo = t.worst_view_render_res
        intr_lo = cam.intrinsics_from_fov(cfg.fov_deg, lo, lo)
        c2w, _, _ = poses_mod.sample_sphere_poses(None, bs * v, cfg.camera,
                                                  given_yaws=yaws,
                                                  given_pitches=pitches)
        rd, ey, zd = cam.generate_rays(intr_lo, c2w)
        out = render_mpi(mpi_rep, geom.dhw, rd, ey, zd, True)
        img = jax.image.resize(out.color, (bs * v, 3, res, res), "bilinear")
        scores = disc_cfg.apply(state.params_d, img * 2 - 1,
                                flat_pose_from_c2w(c2w, t.d_cond_pose_dim))
        idx = jnp.argmin(scores.reshape(bs, v), axis=1)
        sel = idx + jnp.arange(bs) * v
        return yaws[sel], pitches[sel]

    def step(state, real_imgs, real_pose, rng):
        rng_d, rng_g, rng_w = jax.random.split(rng, 3)
        bs = real_imgs.shape[0]
        mbs = bs // args.batch_split
        # D phase
        fakes, poses_l = [], []
        for s in range(args.batch_split):
            kz, kn, kp = jax.random.split(jax.random.fold_in(rng_d, s), 3)
            z = jax.random.normal(kz, (mbs, t.z_dim))
            mpi = synth(state.params_g, state.buffers_g, z, kn, stop=True)
            yaws, pitches = poses_mod.sample_yaw_pitch(kp, mbs, cfg.camera)
            fi, fp = render_local(mpi, yaws, pitches)
            fakes.append(fi)
            poses_l.append(fp)
        fake = jax.lax.stop_gradient(jnp.concatenate(fakes, 0))
        fpose = jnp.concatenate(poses_l, 0)

        d_app = jax.checkpoint(disc_cfg.apply)

        def d_loss_fn(pd):
            lr_, lf_ = d_gan_loss(disc_cfg.apply(pd, real_imgs, real_pose),
                                  disc_cfg.apply(pd, fake, fpose))
            r1 = r1_penalty(lambda im: d_app(pd, im, real_pose),
                            real_imgs, t.r1_lambda)
            return lr_ + lf_ + r1

        d_grads = jax.grad(d_loss_fn)(state.params_d)
        upd, opt_d_s = opt_d.update(d_grads, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, upd)

        # G phase at the worst views
        z = jax.random.normal(jax.random.fold_in(rng_g, 0), (bs, t.z_dim))
        yaws, pitches = worst_views(state, z, rng_w)

        def g_loss_fn(pg):
            total = 0.0
            for s in range(args.batch_split):
                sl = slice(s * mbs, (s + 1) * mbs)
                mpi = synth(pg, state.buffers_g, z[sl],
                            jax.random.fold_in(rng_g, 10 + s))
                imgs, fp = render_local(mpi, yaws[sl], pitches[sl])
                total = total + g_gan_loss(
                    disc_cfg.apply(params_d, imgs, fp)) / args.batch_split
            return total

        g_grads = jax.grad(g_loss_fn)(state.params_g)
        updg, opt_g_s = opt_g.update(g_grads, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updg)
        ema = jax.tree_util.tree_map(
            lambda e, p: 0.999 * e + 0.001 * p, state.ema, params_g)
        return state._replace(params_g=params_g, params_d=params_d,
                              opt_g=opt_g_s, opt_d=opt_d_s, ema=ema)

    state_sh = jax.eval_shape(lambda k: init_train_state(cfg, k),
                              jax.random.key(0))
    real = jax.ShapeDtypeStruct((args.batch, 3, res, res), jnp.float32)
    pose = jax.ShapeDtypeStruct((args.batch, 16), jnp.float32)
    rng = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)

    print("lowering...", flush=True)
    lowered = jax.jit(step, donate_argnums=(0,)).lower(
        state_sh, real, pose, rng)
    print("compiling...", flush=True)
    rec = {"preset": "FFHQ1024", "plane_shards": args.plane_shards,
           "tile_shards": args.tile_shards, "batch": args.batch,
           "batch_split": args.batch_split, "n_planes": n_planes,
           "l_per_chip": l_shard, "rows_per_chip": rows}
    try:
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        rec.update({
            "compiled": True,
            "arg_gib": round(ma.argument_size_in_bytes / 2**30, 3),
            "out_gib": round(ma.output_size_in_bytes / 2**30, 3),
            "temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
            "alias_gib": round(ma.alias_size_in_bytes / 2**30, 3),
        })
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        rec["total_gib"] = round(total / 2**30, 3)
        rec["fits_16g_v5e"] = bool(total < 15.75 * 2**30)
    except Exception as e:
        rec.update({"compiled": False, "error": str(e)[-1800:]})
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

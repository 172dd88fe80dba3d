#!/usr/bin/env python
"""CLI launcher — the ``launch.py`` / ``run_gmpi.py`` analogue.

Single-process SPMD over all local TPU devices (no mp.spawn needed):

    python train_gmpi.py --dataset FFHQ256 \
        --data_root ffhq256x256.zip --pose_root ffhq256_deep3dface_coeffs \
        --output_dir runs/ffhq256 [--warm_start stylegan2_ffhq256.npz]
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True,
                   help="a gmpi_tpu.config.PRESETS key "
                        "(FFHQ256/FFHQ512/FFHQ1024/AFHQCat/MetFaces)")
    p.add_argument("--data_root", required=True, help="image zip/folder path")
    p.add_argument("--pose_root", required=True, help="pose coefficient dir")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--total_iters", type=int, default=None)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--warm_start", default=None,
                   help=".npz state dict (reference naming) to warm start G from")
    p.add_argument("--warm_start_d", default=None,
                   help=".npz state dict to warm start D from (the reference "
                        "copies BOTH G and D from the StyleGAN2 pkl, "
                        "gmpi/train.py:197-230)")
    p.add_argument("--inception_weights", default=None,
                   help=".npz InceptionV3 weights; enables in-training FID "
                        "every --fid_interval steps (gmpi/train.py:1009-1071)")
    p.add_argument("--fid_interval", type=int, default=5000)
    p.add_argument("--fid_n_imgs", type=int, default=2048)
    p.add_argument("--fused_renderer", action="store_true",
                   help="force the fused Pallas MXU render path (default: "
                        "auto — fused on accelerators, portable on CPU)")
    p.add_argument("--no_fused_renderer", action="store_true",
                   help="force the portable tiled/gather render path")
    p.add_argument("--renderer_plane_shards", type=int, default=0,
                   help="shard the renderer's plane axis over this many "
                        "local chips (the FFHQ1024 memory axis; params and "
                        "batch replicate, see docs/TPU_TRAIN.md)")
    p.add_argument("--renderer_tile_shards", type=int, default=0,
                   help="additionally shard output pixel rows over this "
                        "many chips (plane x tile mesh)")
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (multi-host pod slice)")
    args = p.parse_args()

    import numpy as np

    import jax

    if args.multihost:
        # coordinator/process env comes from the TPU pod runtime
        jax.distributed.initialize()

    from gmpi_tpu.config import PRESETS, get_config
    from gmpi_tpu.data import ShardedLoader, get_dataset
    from gmpi_tpu.train.loop import train

    if args.dataset not in PRESETS:
        p.error(f"--dataset must be one of {sorted(PRESETS)}")
    cfg = get_config(args.dataset)
    if (args.fused_renderer or args.no_fused_renderer
            or args.renderer_plane_shards or args.renderer_tile_shards):
        import dataclasses

        tr = cfg.train
        if args.fused_renderer or args.no_fused_renderer:
            tr = dataclasses.replace(
                tr, use_fused_renderer=bool(args.fused_renderer))
        if args.renderer_plane_shards or args.renderer_tile_shards:
            tr = dataclasses.replace(
                tr, renderer_plane_shards=args.renderer_plane_shards,
                renderer_tile_shards=args.renderer_tile_shards)
        cfg = dataclasses.replace(cfg, train=tr)
    dataset_name = "FFHQ" if args.dataset.startswith("FFHQ") else args.dataset
    dataset = get_dataset(
        dataset_name,
        dataset_path=args.data_root,
        raw_img_size=cfg.resolution,
        img_size=cfg.hparams.img_size,
        pose_data_path=args.pose_root,
        sphere_center=cfg.camera.sphere_center_z,
        sphere_r=cfg.camera.sphere_r,
        flat_pose_dim=cfg.train.d_cond_pose_dim,
    )
    # multi-host: each host loads its shard; devices within a host are fed by
    # the host batch, sharded over the mesh's data axis by the train loop
    loader = ShardedLoader(
        dataset,
        batch_size=cfg.hparams.batch_size,
        shard_id=jax.process_index(),
        num_shards=jax.process_count(),
        seed=args.seed,
    )

    init_params_g = init_buffers_g = init_params_d = None
    if args.warm_start:
        from gmpi_tpu.models.converter import convert_generator_checkpoint

        with np.load(args.warm_start) as data:
            sd = {k: data[k] for k in data.files}
        init_params_g, init_buffers_g = convert_generator_checkpoint(
            sd, cfg.generator_cfg(), warm_start=True, key=jax.random.key(args.seed)
        )
    if args.warm_start_d:
        from gmpi_tpu.models.converter import convert_discriminator_checkpoint

        with np.load(args.warm_start_d) as data:
            sd_d = {k: data[k] for k in data.files}
        init_params_d = convert_discriminator_checkpoint(
            sd_d, cfg.discriminator_cfg(), warm_start=True,
            key=jax.random.key(args.seed + 7),
        )

    fid_feature_fn = fid_real_images = None
    if args.inception_weights:
        from gmpi_tpu.eval.inception import load_params, make_feature_fn

        inc_params = load_params(args.inception_weights)
        fid_feature_fn = make_feature_fn(inc_params)
        # cache the first N real images for the in-training FID reference set
        # (gmpi/fid_evaluation.py:38-86's real-image cache analogue)
        reals = []
        n_have = 0
        for i in range(len(dataset)):
            img = np.asarray(dataset[i][0])
            reals.append(img)
            n_have += 1
            if n_have >= args.fid_n_imgs:
                break
        fid_real_images = np.stack(reals)

    train(
        cfg,
        iter(loader),
        args.output_dir,
        total_iters=args.total_iters,
        resume=not args.no_resume,
        init_params_g=init_params_g,
        init_buffers_g=init_buffers_g,
        init_params_d=init_params_d,
        seed=args.seed,
        eval_freq=args.fid_interval,
        fid_feature_fn=fid_feature_fn,
        fid_real_images=fid_real_images,
    )


if __name__ == "__main__":
    main()

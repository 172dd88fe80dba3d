#!/usr/bin/env python
"""Evaluation orchestrator — the ``gmpi/eval/eval.sh`` analogue.

Tasks: prepare_real | prepare_fake | fid_kid | consistency | geometry.

    python eval_gmpi.py --task prepare_fake --dataset FFHQ256 \
        --ckpt runs/ffhq256/checkpoints --out eval_out --n_imgs 2048
    python eval_gmpi.py --task fid_kid --real_dir eval_real --fake_dir eval_out/rgb \
        --inception_weights pt_inception.pth

FID/KID need local InceptionV3 weights; identity consistency and pose
estimation require external models (ArcFace / Deep3DFace), exactly as in the
reference (separate conda envs, ``eval.sh:58-62``) — pass hooks via
``--embedder_module`` exposing ``embed(image_hwc_uint8) -> vector``.
"""

from __future__ import annotations

import argparse
import json
import os


def build_generator(args):
    import numpy as np

    import jax

    from gmpi_tpu.config import get_config
    from gmpi_tpu.eval.harness import FakeImageGenerator
    from gmpi_tpu.train.checkpoint import load_checkpoint
    from gmpi_tpu.train.step import init_train_state

    cfg = get_config(args.dataset)
    state = init_train_state(cfg, jax.random.key(0))
    state = load_checkpoint(args.ckpt, state)
    params = state.ema if args.use_ema else state.params_g
    return cfg, FakeImageGenerator(
        cfg, params, state.buffers_g,
        n_planes=args.n_planes, img_size=args.img_size,
        chunk_n_planes=args.chunk_n_planes, truncation_psi=args.truncation_psi,
        sanity_full_alpha=getattr(args, "stylegan2_sanity_check", False),
        use_fused=getattr(args, "fused_renderer", False),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", required=True,
                   choices=["prepare_real", "prepare_fake", "fid_kid",
                            "consistency", "geometry", "all"])
    p.add_argument("--dataset", default="FFHQ256")
    p.add_argument("--ckpt", default=None, help="checkpoint dir (with 'latest')")
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--out", default="eval_out")
    p.add_argument("--n_imgs", type=int, default=2048)
    p.add_argument("--n_planes", type=int, default=96)
    p.add_argument("--img_size", type=int, default=None)
    p.add_argument("--chunk_n_planes", type=int, default=-1)
    p.add_argument("--truncation_psi", type=float, default=1.0)
    p.add_argument("--fused_renderer", action="store_true",
                   help="render through the fused Pallas kernel when shapes allow")
    p.add_argument("--stylegan2_sanity_check", action="store_true",
                   help="force all alphas to 1 (validates renderer+eval plumbing "
                        "against vanilla StyleGAN2; eval.sh:43-47)")
    # prepare_real
    p.add_argument("--data_root", default=None)
    p.add_argument("--pose_root", default=None)
    # fid_kid
    p.add_argument("--real_dir", default=None)
    p.add_argument("--fake_dir", default=None)
    p.add_argument("--inception_weights", default=None)
    # consistency / geometry external-model adapters (gmpi_tpu.eval.adapters)
    p.add_argument("--embedder", default=None,
                   help='"module:attr" FaceEmbedder (e.g. '
                        'gmpi_tpu.eval.adapters:ArcFaceEmbedder)')
    p.add_argument("--embedder_module", default=None,
                   help="legacy: python module exposing embed(img) -> vec")
    p.add_argument("--landmark_detector", default=None,
                   help='"module:attr" LandmarkDetector (e.g. '
                        'gmpi_tpu.eval.adapters:MTCNNLandmarkDetector)')
    p.add_argument("--pose_estimator", default=None,
                   help='"module:attr" PoseEstimator (Deep3DFace glue)')
    p.add_argument("--n_consistency", type=int, default=1024)
    p.add_argument("--n_geometry", type=int, default=1024)
    args = p.parse_args()

    if args.task == "all":
        run_all(args)
        return

    if args.task == "prepare_real":
        from gmpi_tpu.config import get_config
        from gmpi_tpu.data import get_dataset
        from gmpi_tpu.eval.harness import prepare_real_images

        cfg = get_config(args.dataset)
        name = "FFHQ" if args.dataset.startswith("FFHQ") else args.dataset
        ds = get_dataset(
            name, dataset_path=args.data_root, raw_img_size=cfg.resolution,
            img_size=args.img_size or cfg.resolution, pose_data_path=args.pose_root,
            sphere_center=cfg.camera.sphere_center_z, sphere_r=cfg.camera.sphere_r,
            flat_pose_dim=cfg.train.d_cond_pose_dim,
        )
        n = prepare_real_images(ds, args.out, args.n_imgs)
        print(f"wrote {n} real images to {args.out}")

    elif args.task == "prepare_fake":
        from gmpi_tpu.eval.harness import prepare_fake_images

        cfg, gen = build_generator(args)
        prepare_fake_images(gen, args.out, args.n_imgs, task="fid_kid")
        print(f"wrote {args.n_imgs} fake images to {args.out}")

    elif args.task == "geometry":
        from gmpi_tpu.eval.adapters import load_adapter
        from gmpi_tpu.eval.harness import compute_geometry_dir, prepare_fake_images

        assert args.landmark_detector and args.pose_estimator, \
            "geometry needs --landmark_detector and --pose_estimator adapters"
        if args.img_size is None:
            args.img_size = 224  # reference renders geometry at 224^2 (eval.sh:61)
        cfg, gen = build_generator(args)
        prepare_fake_images(gen, args.out, args.n_imgs, task="geometry")
        metrics = compute_geometry_dir(
            args.out, args.n_imgs,
            load_adapter(args.landmark_detector), load_adapter(args.pose_estimator))
        with open(os.path.join(args.out, "geometry.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print(json.dumps(metrics))

    elif args.task == "fid_kid":
        from gmpi_tpu.eval.harness import compute_fid_kid_dirs
        from gmpi_tpu.eval.inception import load_params, make_feature_fn

        assert args.inception_weights, "FID needs local InceptionV3 weights"
        feature_fn = make_feature_fn(load_params(args.inception_weights))
        metrics = compute_fid_kid_dirs(args.real_dir, args.fake_dir, feature_fn)
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "fid_kid.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print(json.dumps(metrics))

    elif args.task == "consistency":
        from gmpi_tpu.eval.harness import compute_consistency_dir, prepare_fake_images

        cfg, gen = build_generator(args)
        prepare_fake_images(gen, args.out, args.n_imgs, task="consistency")
        embed_fn = _resolve_embedder(args)
        metrics = compute_consistency_dir(args.out, args.n_imgs, embed_fn)
        with open(os.path.join(args.out, "consistency.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print(json.dumps(metrics))


def _resolve_embedder(args):
    if args.embedder:
        from gmpi_tpu.eval.adapters import load_adapter

        return load_adapter(args.embedder).embed
    assert args.embedder_module, \
        "consistency needs --embedder (module:attr) or --embedder_module"
    import importlib

    return importlib.import_module(args.embedder_module).embed


def run_all(args):
    """One-command chain (``gmpi/eval/eval.sh:64-172``): prepare_real ->
    prepare_fake -> fid_kid -> consistency -> geometry.  Steps whose
    external dependency is absent are skipped with a notice."""
    import copy

    from gmpi_tpu.eval.adapters import load_adapter
    from gmpi_tpu.eval.harness import (
        compute_consistency_dir, compute_fid_kid_dirs, compute_geometry_dir,
        prepare_fake_images, prepare_real_images)

    os.makedirs(args.out, exist_ok=True)
    results = {}

    # 1. real images
    real_dir = args.real_dir or os.path.join(args.out, "real")
    if args.data_root:
        from gmpi_tpu.config import get_config
        from gmpi_tpu.data import get_dataset

        cfg = get_config(args.dataset)
        name = "FFHQ" if args.dataset.startswith("FFHQ") else args.dataset
        ds = get_dataset(
            name, dataset_path=args.data_root, raw_img_size=cfg.resolution,
            img_size=args.img_size or cfg.resolution, pose_data_path=args.pose_root,
            sphere_center=cfg.camera.sphere_center_z, sphere_r=cfg.camera.sphere_r,
            flat_pose_dim=cfg.train.d_cond_pose_dim,
        )
        prepare_real_images(ds, real_dir, args.n_imgs)

    # 2. fakes + FID/KID
    cfg, gen = build_generator(args)
    fake_dir = os.path.join(args.out, "fake")
    prepare_fake_images(gen, fake_dir, args.n_imgs, task="fid_kid")
    if args.inception_weights and os.path.isdir(real_dir):
        from gmpi_tpu.eval.inception import load_params, make_feature_fn

        feature_fn = make_feature_fn(load_params(args.inception_weights))
        results["fid_kid"] = compute_fid_kid_dirs(
            real_dir, os.path.join(fake_dir, "rgb"), feature_fn)
    else:
        print("[all] skipping fid_kid (need --inception_weights and real images)")

    # 3. consistency (2 views / z)
    if args.embedder or args.embedder_module:
        cons_dir = os.path.join(args.out, "consistency")
        prepare_fake_images(gen, cons_dir, args.n_consistency, task="consistency")
        results["consistency"] = compute_consistency_dir(
            cons_dir, args.n_consistency, _resolve_embedder(args))
    else:
        print("[all] skipping consistency (need --embedder)")

    # 4. geometry (224^2 renders, depth + angles)
    if args.landmark_detector and args.pose_estimator:
        geo_args = copy.copy(args)
        geo_args.img_size = args.img_size or 224
        _, geo_gen = build_generator(geo_args)
        geo_dir = os.path.join(args.out, "geometry")
        prepare_fake_images(geo_gen, geo_dir, args.n_geometry, task="geometry")
        results["geometry"] = compute_geometry_dir(
            geo_dir, args.n_geometry,
            load_adapter(args.landmark_detector), load_adapter(args.pose_estimator))
    else:
        print("[all] skipping geometry (need --landmark_detector/--pose_estimator)")

    with open(os.path.join(args.out, "eval_all.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

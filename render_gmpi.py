#!/usr/bin/env python
"""Visualization CLI — ``gmpi/eval/vis/render_video.py`` + ``extract_mesh.py``
analogue: single images, camera-path videos, MPI sheets, and mesh extraction.

    python render_gmpi.py --dataset FFHQ256 --ckpt runs/ffhq256/checkpoints \
        --out vis/ --seed 7 --nplanes 96 [--vertical] [--mesh]
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="FFHQ256")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--nplanes", type=int, default=96)
    p.add_argument("--n_frames", type=int, default=100)
    p.add_argument("--vertical", action="store_true")
    p.add_argument("--chunk_n_planes", type=int, default=-1)
    p.add_argument("--truncation_psi", type=float, default=1.0)
    p.add_argument("--mesh", action="store_true", help="also extract a .ply mesh")
    p.add_argument("--mesh_planes", type=int, default=128)
    args = p.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from gmpi_tpu.config import get_config
    from gmpi_tpu.train.checkpoint import load_checkpoint
    from gmpi_tpu.train.step import init_train_state
    from gmpi_tpu.viz.render_video import render_video_artifacts

    cfg = get_config(args.dataset)
    state = init_train_state(cfg, jax.random.key(0))
    state = load_checkpoint(args.ckpt, state)

    render_video_artifacts(
        cfg, state.ema, state.buffers_g, args.out,
        seed=args.seed, n_frames=args.n_frames, horizontal=not args.vertical,
        n_planes=args.nplanes, chunk_n_planes=args.chunk_n_planes,
        truncation_psi=args.truncation_psi,
    )
    print(f"wrote video artifacts to {args.out}")

    if args.mesh:
        import dataclasses

        from gmpi_tpu.core import geometry as geom_mod
        from gmpi_tpu.eval.generate import generate_mpi
        from gmpi_tpu.viz.mesh import extract_mesh_from_alpha, mpi_mesh_volume_bounds, save_ply

        # dense uniform-depth alpha volume (``eval/common.py:161-222``)
        mesh_cfg = dataclasses.replace(
            cfg, planes=dataclasses.replace(
                cfg.planes, n_planes=args.mesh_planes, distance_sample_method="uniform"
            ),
        )
        geom = mesh_cfg.plane_geometry()
        xyz = cfg.multi_res_xyz(geom)
        z = jax.random.normal(jax.random.key(args.seed), (1, cfg.train.z_dim), jnp.float32)
        mpi = generate_mpi(cfg.generator_cfg(), state.ema, state.buffers_g, z, xyz,
                           args.mesh_planes, chunk_n_planes=args.chunk_n_planes,
                           truncation_psi=args.truncation_psi, noise_mode="const")
        alpha = np.asarray(mpi[0, :, 3])  # [L, H, W]
        vmin, vmax, _ = mpi_mesh_volume_bounds(np.asarray(geom.dhw), cfg.planes.min_d, cfg.planes.max_d)
        verts, faces = extract_mesh_from_alpha(alpha, vmin, vmax, iso=0.01)
        ply = os.path.join(args.out, "mesh.ply")
        save_ply(ply, verts, faces)
        print(f"wrote {len(verts)} verts / {len(faces)} faces to {ply}")


if __name__ == "__main__":
    main()

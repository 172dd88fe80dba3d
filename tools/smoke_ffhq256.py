"""FFHQ256 smoke run on synthetic data (VERDICT round-1 item 5 'Done').

Runs the REAL FFHQ256 architecture (512-d z/w, full channel widths, 256²)
for --steps steps on synthetic data, with in-training FID over random
inception weights, snapshot grids + MPI sheets, a checkpoint, and a resume
leg — producing every training artifact without real data.

    python tools/smoke_ffhq256.py --out /tmp/smoke_ffhq256 --steps 3 [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fused", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import dataclasses

    import numpy as np
    import jax.numpy as jnp

    from gmpi_tpu.config import get_config
    from gmpi_tpu.eval.inception import make_feature_fn, random_params
    from gmpi_tpu.train.loop import train

    cfg = get_config("FFHQ256")
    cfg = dataclasses.replace(
        cfg,
        hparams=dataclasses.replace(cfg.hparams, batch_size=args.batch),
        train=dataclasses.replace(
            cfg.train, n_view_per_z=2, total_iters=args.steps,
            use_fused_renderer=args.fused,
            # lighting starts at iter 1000 in the real config; pull it into
            # the smoke so the augmentation path compiles + runs
            lighting_start_iter=1,
        ),
    )

    rng = np.random.default_rng(0)

    def batches():
        while True:
            yield (
                rng.uniform(-1, 1, (args.batch, 3, 256, 256)).astype(np.float32),
                rng.standard_normal((args.batch, 16)).astype(np.float32),
            )

    feature_fn = make_feature_fn(random_params(jax.random.key(0)))
    reals = rng.uniform(-1, 1, (8, 3, 256, 256)).astype(np.float32)

    state = train(
        cfg, batches(), args.out,
        total_iters=args.steps,
        sample_interval=max(1, args.steps - 1),
        model_save_interval=max(1, args.steps - 1),
        eval_freq=max(1, args.steps - 1),
        fid_feature_fn=feature_fn,
        fid_real_images=reals,
        seed=0,
    )
    step1 = int(np.asarray(state.step))

    # resume leg: two more steps from the checkpoint
    state2 = train(
        cfg, batches(), args.out,
        total_iters=args.steps + 2,
        sample_interval=1000, model_save_interval=1000,
        seed=0,
    )
    step2 = int(np.asarray(state2.step))

    artifacts = {
        "steps_run": step1,
        "steps_after_resume": step2,
        "metrics_jsonl": os.path.exists(os.path.join(args.out, "metrics.jsonl")),
        "snaps": sorted(os.listdir(os.path.join(args.out, "snaps"))),
        "checkpoint": os.path.exists(os.path.join(args.out, "checkpoints", "latest")),
        "fid_logged": any(
            "fid" in json.loads(l)
            for l in open(os.path.join(args.out, "metrics.jsonl"))),
    }
    print(json.dumps(artifacts, indent=2))
    assert step2 == args.steps + 2 and artifacts["checkpoint"]
    assert artifacts["fid_logged"], "in-training FID did not run"
    print("SMOKE OK")


if __name__ == "__main__":
    main()

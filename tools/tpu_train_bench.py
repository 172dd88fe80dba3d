"""Measure the REAL train step on the actual accelerator (VERDICT r2 #4).

Runs ``make_train_step`` for a preset on synthetic data and records what the
reference never publishes and round 2 never measured: per-step wall time,
compile time, and the HBM high-water mark of one full GAN step (D with R1
grad-of-grad + worst-view G) on the chip.

    python tools/tpu_train_bench.py --preset FFHQ256 --steps 20
    python tools/tpu_train_bench.py --preset FFHQ1024 --steps 2 \
        --plane_chunk 16 --r1_remat --worst_view_res 64

Prints one JSON line; append results to docs/TPU_TRAIN.md.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="FFHQ256")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--batch_split", type=int, default=0,
                    help="override the preset's micro-batching (0 = keep)")
    ap.add_argument("--plane_chunk", type=int, default=0,
                    help="renderer plane chunking (memory relief; 0 = off)")
    ap.add_argument("--r1_remat", action="store_true")
    ap.add_argument("--worst_view_res", type=int, default=0,
                    help="low-res worst-view selection (0 = full res)")
    ap.add_argument("--no_worst_view", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="render through the fused Pallas kernel")
    ap.add_argument("--fused_bf16", action="store_true",
                    help="bf16 texture compute dtype in the fused renderer")
    ap.add_argument("--fused_remat", action="store_true",
                    help="per-chunk checkpoint through the fused renderer")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None,
                    help="append the JSON record to this file "
                         "(e.g. TRAINBENCH_r05.json)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp

    from gmpi_tpu.config import get_config
    from gmpi_tpu.train.step import init_train_state, make_train_step

    cfg = get_config(args.preset)
    hp = dataclasses.replace(cfg.hparams, batch_size=args.batch)
    if args.batch_split:
        hp = dataclasses.replace(hp, batch_split=args.batch_split)
    tr = dataclasses.replace(
        cfg.train,
        renderer_plane_chunk=args.plane_chunk or None,
        r1_remat=args.r1_remat,
        worst_view_render_res=args.worst_view_res,
        select_worst_view=not args.no_worst_view,
        # True forces fused; default None = auto (fused on accelerators)
        use_fused_renderer=True if args.fused else None,
        fused_compute_dtype="bf16" if args.fused_bf16 else None,
        fused_remat=args.fused_remat,
    )
    cfg = dataclasses.replace(cfg, hparams=hp, train=tr)

    res = cfg.hparams.img_size
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.uniform(-1, 1, (args.batch, 3, res, res)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((args.batch, 16)).astype(np.float32))

    dev = jax.devices()[0]

    def hbm_peak():
        try:
            stats = dev.memory_stats()
            return int(stats.get("peak_bytes_in_use", 0))
        except Exception:
            return 0

    t0 = time.perf_counter()
    state = init_train_state(cfg, jax.random.key(0))
    jax.block_until_ready(state.params_g)
    t_init = time.perf_counter() - t0

    step_fn = make_train_step(cfg, donate=True)
    # compiled per-chip memory (buffer-assignment truth, not just the
    # allocator high-water mark): argument/output/temp bytes of the step
    mem = {}
    try:
        lowered = step_fn.lower(state, real, pose, jax.random.key(1))
        ma = lowered.compile().memory_analysis()
        mem = {
            "compiled_arg_gib": round(ma.argument_size_in_bytes / 2**30, 3),
            "compiled_out_gib": round(ma.output_size_in_bytes / 2**30, 3),
            "compiled_temp_gib": round(ma.temp_size_in_bytes / 2**30, 3),
            "compiled_alias_gib": round(ma.alias_size_in_bytes / 2**30, 3),
        }
    except Exception as e:  # memory_analysis availability varies per backend
        mem = {"compiled_mem_error": str(e)[:120]}
    t0 = time.perf_counter()
    state, metrics = step_fn(state, real, pose, jax.random.key(1))
    jax.block_until_ready((state, metrics))
    t_compile = time.perf_counter() - t0

    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, real, pose, jax.random.fold_in(jax.random.key(2), i))
        # block on the FULL state: metrics alone don't depend on the
        # optimizer-state writes, so async dispatch under-measures
        jax.block_until_ready((state, metrics))
        times.append(time.perf_counter() - t0)

    # authoritative stat: N steps between HARD host syncs (a scalar fetch).
    # Through the remote tunnel, block_until_ready alone can return while
    # the device still runs ahead (r5: a 512-square GAN step "measured"
    # 26 ms that way) — the wall/N below cannot lie, and one fetch
    # amortizes the tunnel round-trip over all N steps.
    float(np.asarray(metrics["d_loss"]))
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, metrics = step_fn(state, real, pose,
                                 jax.random.fold_in(jax.random.key(3), i))
    synced_total = None
    float(np.asarray(metrics["d_loss"]))
    synced_total = time.perf_counter() - t0

    metrics_f = {k: float(v) for k, v in metrics.items()}
    finite = all(np.isfinite(v) for v in metrics_f.values())
    out = {
        "preset": args.preset,
        "platform": dev.platform,
        "batch": args.batch,
        "batch_split": cfg.hparams.batch_split,
        "plane_chunk": args.plane_chunk or None,
        "r1_remat": args.r1_remat,
        "worst_view_res": args.worst_view_res or res,
        "select_worst_view": not args.no_worst_view,
        "fused_renderer": args.fused,
        # effective renderer path: use_fused_renderer=None auto-selects the
        # fused Pallas kernel on TPU (the CLI flag only FORCES it)
        "fused_effective": bool(tr.use_fused_renderer
                                if tr.use_fused_renderer is not None
                                else dev.platform == "tpu"),
        "init_s": round(t_init, 2),
        "first_step_s_incl_compile": round(t_compile, 2),
        "step_s_median": round(float(np.median(times)), 4),
        "step_s_p10": round(float(np.percentile(times, 10)), 4),
        "step_s_p90": round(float(np.percentile(times, 90)), 4),
        "step_s_min": round(float(np.min(times)), 4),
        # wall/N between hard syncs — the authoritative step time
        "step_s_synced": round(synced_total / args.steps, 4),
        "imgs_per_s": round(args.batch / (synced_total / args.steps), 3),
        "imgs_per_s_dispatch_median": round(
            args.batch / float(np.median(times)), 3),
        "hbm_peak_gib": round(hbm_peak() / 2**30, 2),
        **mem,
        "steps": args.steps,
        "finite": finite,
        "metrics_last": {k: round(v, 4) for k, v in metrics_f.items()},
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()

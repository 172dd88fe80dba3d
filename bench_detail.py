#!/usr/bin/env python
"""Detailed renderer benchmark + speed-of-light roofline report.

Complements ``bench.py`` (the driver's single-line metric) with a component
breakdown — forward, forward+backward, per-stage — and the roofline
accounting BASELINE asks for (``gmpi_tpu/utils/roofline.py``).  Optionally
writes a ``jax.profiler`` trace for offline inspection.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--planes", type=int, default=96)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--plane_chunk", type=int, default=16)
    ap.add_argument("--trace_dir", default=None, help="write a jax.profiler trace here")
    ap.add_argument("--fused", action="store_true",
                    help="benchmark the fused Pallas MXU path (component split)")
    ap.add_argument("--precision", default="high",
                    choices=["default", "high", "highest", "bf16x3"],
                    help="MXU precision of the fused path (default = bf16x1 "
                         "fast mode; bf16x3 = manual split-operand HIGH)")
    ap.add_argument("--no_early_out", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 texture/hat operands, fp32 accumulation")
    args = ap.parse_args()

    if args.fused:
        return fused_detail(args)

    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import homography_grid, render_mpi_chunked
    from gmpi_tpu.ops.tiled_warp import required_bands
    from gmpi_tpu.ops.tiled_warp_adjoint import check_monotone, required_output_bands
    from gmpi_tpu.utils.roofline import TPU_V5E, attained, render_cost

    L, R = args.planes, args.res
    geom = geom_mod.build_plane_geometry(
        n_planes=L, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
    )
    k1, k2 = jax.random.split(jax.random.key(0))
    rgba = jax.jit(lambda k: jax.random.uniform(k, (1, L, 4, R, R), jnp.float32))(k1)
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[0.1]]), given_pitches=jnp.asarray([[0.05]]),
    )
    intr = cam.intrinsics_from_fov(12.6, R, R)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    cot = jax.jit(lambda k: jax.random.normal(k, (1, 3, R, R), jnp.float32))(k2)

    dhw_f = jnp.asarray(geom.dhw)
    ray_f = jnp.broadcast_to(ray_dir[:, None], (1, L, 3, R, R)).reshape(L, 3, R, R)
    eye_f = jnp.broadcast_to(eye[:, None], (1, L, 3)).reshape(L, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (1, L, 3)).reshape(L, 3)
    grid, _ = homography_grid(dhw_f, eye_f, ray_f, z_f)
    by, bx = required_bands((L, 4, R, R), grid, tile=(8, 128))
    if check_monotone((L, 4, R, R), grid):
        pbr, pbc = required_output_bands((L, 4, R, R), grid, tile=(32, 128))
        bands = (int(by), int(bx), int(pbr) + 4, int(pbc) + 8)
    else:
        bands = (int(by), int(bx))
    print(f"warp bands: {bands}")

    def timed(fn, *a, name="", iters=3):
        r = fn(*a)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            r = fn(*a)
            # full-tree sync (a single-element read lets XLA DCE whole
            # pallas calls upstream — r5 finding)
            jax.block_until_ready(r)
            float(np.asarray(sum(jnp.sum(l[..., 0].astype(jnp.float32))
                                 for l in jax.tree_util.tree_leaves(r))))
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:<28} {best * 1000:8.1f} ms")
        return best

    fwd = jax.jit(
        lambda x: render_mpi_chunked(x, geom.dhw, ray_dir, eye, z_dir, with_disp=False,
                                     plane_chunk=args.plane_chunk, tiled_bands=bands).color
    )
    loss = lambda x: jnp.sum(
        render_mpi_chunked(x, geom.dhw, ray_dir, eye, z_dir, with_disp=False,
                           plane_chunk=args.plane_chunk, tiled_bands=bands).color * cot
    )
    grad = jax.jit(jax.grad(loss))

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            t_fwd = timed(fwd, rgba, name="render fwd")
            t_fb = timed(grad, rgba, name="render fwd+bwd")
    else:
        t_fwd = timed(fwd, rgba, name="render fwd")
        t_fb = timed(grad, rgba, name="render fwd+bwd")

    for nm, t, bwd in (("fwd", t_fwd, False), ("fwd+bwd", t_fb, True)):
        cost = render_cost(1, L, R, R, R, R, backward=bwd)
        rep = attained(t, cost, TPU_V5E)
        print(
            f"roofline[{nm}]: SOL {rep['speed_of_light_s']*1e3:.1f} ms "
            f"({rep['bound']}-bound) -> {rep['sol_fraction']*100:.1f}% of SOL, "
            f"{rep['attained_gbps']:.0f} GB/s, {rep['attained_tflops']:.2f} TFLOP/s"
        )
    print(f"throughput fwd+bwd: {R*R/1e6/t_fb:.3f} Mpix/s/chip")


def fused_detail(args):
    """Component breakdown of the fused Pallas path: forward kernel chain,
    composite backward (XLA), splat kernels, end-to-end grad."""
    from jax import lax as _lax

    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import plan_fused
    from gmpi_tpu.ops.pallas_warp import (
        fused_bands_ok, make_fused_renderer, plane_affine, ray_fields,
        render_mpi_fused_fwd)
    from gmpi_tpu.utils.roofline import TPU_V5E, attained, render_cost

    L, R = args.planes, args.res
    # Mosaic lowers only DEFAULT and HIGHEST dot precisions inside Pallas
    # kernels (HIGH raises NotImplementedError on device); "high" stays as a
    # CLI alias for interpret-mode experiments but is promoted to HIGHEST on
    # the TPU backend specifically (other backends lower HIGH fine)
    on_tpu = jax.default_backend() == "tpu" or any(
        d.platform == "tpu" for d in jax.devices())
    prec = {"default": _lax.Precision.DEFAULT,
            "high": _lax.Precision.HIGHEST if on_tpu else _lax.Precision.HIGH,
            "highest": _lax.Precision.HIGHEST,
            "bf16x3": "bf16x3"}[args.precision]
    if args.precision == "high" and on_tpu:
        print("note: precision 'high' promoted to HIGHEST on the TPU backend "
              "(Mosaic lowers only DEFAULT/HIGHEST); measurements are HIGHEST")
    geom = geom_mod.build_plane_geometry(
        n_planes=L, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        n_truncated_stds=2.0, enlarge_factor=1.001, confined=True,
    )
    k1, k2 = jax.random.split(jax.random.key(0))
    rgba = jax.jit(lambda k: jax.random.uniform(k, (1, L, 4, R, R), jnp.float32))(k1)
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[0.1]]), given_pitches=jnp.asarray([[0.05]]),
    )
    intr = cam.intrinsics_from_fov(12.6, R, R)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    cot = jax.jit(lambda k: jax.random.normal(k, (1, 3, R, R), jnp.float32))(k2)
    dhw = jnp.asarray(geom.dhw)

    import time as _t
    t0 = _t.time()
    plan, splat_plan = plan_fused(dhw, ray_dir, eye, z_dir, R, R)
    print(f"planning: {_t.time()-t0:.1f}s; chunks:")
    for (lo, hi, b), s in zip(plan, splat_plan):
        print(f"  [{lo:3d},{hi:3d}) fwd={tuple(b)} splat={tuple(s)}")
    scal = jax.vmap(lambda e: plane_affine(dhw, e, R, R))(eye)
    rx, ry, _ = ray_fields(ray_dir.astype(jnp.float32), z_dir.astype(jnp.float32))
    print("bands_ok:", bool(jax.jit(lambda: fused_bands_ok(scal, rx, ry, plan))()))

    early = not args.no_early_out
    cd = jnp.bfloat16 if args.bf16 else None
    fn = make_fused_renderer(plan, splat_plan, R, R, early_out=early,
                             precision=prec, compute_dtype=cd)

    def timed(f, *a, name="", iters=3):
        r = f(*a)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
        ts = []
        for _ in range(iters):
            t0 = _t.perf_counter()
            r = f(*a)
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), r)
            ts.append(_t.perf_counter() - t0)
        print(f"{name:<34} {min(ts) * 1000:8.1f} ms")
        return min(ts)

    # composite backward alone (XLA suffix sums over the residual stack) —
    # decides whether fusing it into the splat is worth it
    from gmpi_tpu.ops.pallas_warp import (
        composite_bwd, flatten_pixels, LANES)

    def comp_bwd_only(warped_f, gc, qf, scal_v):
        delta = scal_v[:, :, 4][:, :, None, None] * qf[:, None]
        return composite_bwd(warped_f, delta, gc, None, None)

    warped_f = jax.jit(lambda k: jax.random.uniform(
        k, (1, L, 4, R * R // LANES, LANES), jnp.float32))(jax.random.key(1))
    rxs, rys, qs = ray_fields(ray_dir.astype(jnp.float32), z_dir.astype(jnp.float32))
    qf = flatten_pixels(qs).reshape(1, -1, LANES)
    gc = flatten_pixels(cot).reshape(1, 3, -1, LANES)
    comp_jit = jax.jit(comp_bwd_only)

    fwd_nores = jax.jit(lambda x: fn(x, dhw, ray_dir, eye, z_dir)[0])
    fwd_res = jax.jit(lambda x: render_mpi_fused_fwd(
        x, dhw, ray_dir, eye, z_dir, plan, early_out=early,
        precision=prec, compute_dtype=cd)[3])
    grad = jax.jit(jax.grad(
        lambda x: jnp.sum(fn(x, dhw, ray_dir, eye, z_dir)[0] * cot)))

    ctx = jax.profiler.trace(args.trace_dir) if args.trace_dir else None
    if ctx:
        ctx.__enter__()
    # splat (backward warp-transpose kernel chain) alone, on a synthetic
    # cotangent stack — isolates the dominant backward cost
    from gmpi_tpu.ops.pallas_warp import STRIP, warp_splat

    d_samp6 = warped_f.reshape(1, L, 4, R // STRIP, -1, 128)
    rxf = flatten_pixels(rxs)
    ryf = flatten_pixels(rys)

    def splat_only(d6):
        parts = []
        for (lo, hi, bands), spl in zip(plan, splat_plan):
            parts.append(warp_splat(d6[:, lo:hi], rxf, ryf, rys, scal[:, lo:hi],
                                    bands, spl, R, R, precision=prec))
        return jnp.concatenate(parts, axis=1)

    splat_jit = jax.jit(splat_only)

    t_fwd = timed(fwd_nores, rgba, name="fused fwd (no residual read)")
    timed(fwd_res, rgba, name="fused fwd (+warped residual)")
    timed(comp_jit, warped_f, gc, qf, scal, name="composite_bwd alone (XLA)")
    timed(splat_jit, d_samp6, name="splat (bwd warp) alone")
    t_fb = timed(grad, rgba, name="fused fwd+bwd")
    if ctx:
        ctx.__exit__(None, None, None)

    for nm, t, bwd in (("fwd", t_fwd, False), ("fwd+bwd", t_fb, True)):
        cost = render_cost(1, L, R, R, R, R, backward=bwd)
        rep = attained(t, cost, TPU_V5E)
        print(
            f"roofline[{nm}]: SOL {rep['speed_of_light_s']*1e3:.1f} ms "
            f"({rep['bound']}-bound) -> {rep['sol_fraction']*100:.1f}% of SOL, "
            f"{rep['attained_gbps']:.0f} GB/s, {rep['attained_tflops']:.2f} TFLOP/s"
        )
    print(f"throughput fwd+bwd: {R*R/1e6/t_fb:.3f} Mpix/s/chip")


if __name__ == "__main__":
    main()

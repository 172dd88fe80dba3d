#!/usr/bin/env python
"""Round-5 per-phase fused-renderer breakdown (in-graph timing, v5e).

r4's tool adapted to the r5 kernel contract: the grad fwd returns a
per-strip ``n_live`` (dead planes' residual slots are unwritten), the
composite backward masks on it, and liveness fractions come from the
counts.  Emits JSON to stdout (committed as PHASES_r05.json).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_PLANES = 96
RES = TEX = 1024
INNER = 4
OUTER = 3
PREC = "bf16x3"


def timed_ingraph(fn, x, name):
    @jax.jit
    def step(x):
        def body(i, acc):
            out = fn(x * (1.0 + acc * 1e-30))
            # feedback must TOUCH EVERY producer: a single-element read lets
            # XLA dead-code-eliminate all but one chunk kernel (r5 finding —
            # the r4 component numbers under-measured multi-chunk phases)
            fb = sum(jnp.sum(leaf[..., ::7, 0].astype(jnp.float32))
                     for leaf in jax.tree_util.tree_leaves(out))
            return acc + fb * 1e-30

        return lax.fori_loop(0, INNER, body, jnp.zeros((), jnp.float32))

    float(np.asarray(step(x)))  # compile + sync
    times = []
    for _ in range(OUTER):
        t0 = time.perf_counter()
        float(np.asarray(step(x)))
        times.append(time.perf_counter() - t0)
    best = min(times) / INNER
    print(f"# {name:<38} {best * 1000:8.1f} ms", flush=True)
    return best


def main():
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import plan_fused
    from gmpi_tpu.ops.pallas_warp import (
        GRAD_TAU, composite_bwd_pallas, flatten_pixels,
        make_fused_renderer, plane_affine, ray_fields, render_mpi_fused_fwd,
        warp_splat)

    geom = geom_mod.build_plane_geometry(
        n_planes=N_PLANES, min_d=0.95, max_d=1.12,
        distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        n_truncated_stds=2.0, enlarge_factor=1.001, confined=True,
    )
    k1, k2 = jax.random.split(jax.random.key(0))
    rgba = jax.jit(lambda k: jax.random.uniform(
        k, (1, N_PLANES, 4, TEX, TEX), jnp.float32))(k1)
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[0.1]]), given_pitches=jnp.asarray([[0.05]]),
    )
    intr = cam.intrinsics_from_fov(12.6, RES, RES)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    cot = jax.jit(lambda k: jax.random.normal(k, (1, 3, RES, RES), jnp.float32))(k2)
    dhw = jnp.asarray(geom.dhw)

    t0 = time.time()
    plan, splat_plan = plan_fused(dhw, ray_dir, eye, z_dir, TEX, TEX)
    print(f"# planning {time.time() - t0:.0f}s", flush=True)

    fn = make_fused_renderer(plan, splat_plan, TEX, TEX, early_out=True,
                             precision=PREC)
    scal = jax.vmap(lambda e: plane_affine(dhw, e, TEX, TEX))(eye)
    rx, ry, q = ray_fields(ray_dir.astype(jnp.float32), z_dir.astype(jnp.float32))
    rxf, ryf, qf = flatten_pixels(rx), flatten_pixels(ry), flatten_pixels(q)
    gc6 = flatten_pixels(cot)

    res = {}
    res["fwd_no_residual"] = timed_ingraph(
        lambda x: fn(x, dhw, ray_dir, eye, z_dir)[0], rgba, "fwd (no residual)")
    res["fwd_res_sparse"] = timed_ingraph(
        lambda x: render_mpi_fused_fwd(
            x, dhw, ray_dir, eye, z_dir, plan, early_out="grad",
            precision=PREC)[3],
        rgba, "fwd (+residual, grad-sparse)")
    res["fwd_res_dense"] = timed_ingraph(
        lambda x: render_mpi_fused_fwd(
            x, dhw, ray_dir, eye, z_dir, plan, early_out=False,
            precision=PREC)[3],
        rgba, "fwd (+residual, dense)")

    # phase inputs are the REAL intermediates (warped + n_live from the
    # grad fwd; dead slots hold garbage by design — n_live masks them)
    warped, n_live = jax.jit(lambda x: render_mpi_fused_fwd(
        x, dhw, ray_dir, eye, z_dir, plan, early_out="grad",
        precision=PREC)[3:5])(rgba)
    live = float(jnp.mean(n_live.astype(jnp.float32) / N_PLANES))
    print(f"# live-plane fraction (mean n_live/L): {live:.3f}", flush=True)

    comp = jax.jit(lambda w: composite_bwd_pallas(
        w, scal, qf, gc6, None, None, grad_tau=GRAD_TAU, with_live=True,
        n_live=n_live))
    res["composite_bwd_sparse"] = timed_ingraph(
        lambda w: comp(w)[0], warped, "composite_bwd (pallas, sparse)")
    d6, live_flags = comp(warped)

    def splat_all(d6):
        parts = []
        for (lo, hi, bands), spl in zip(plan, splat_plan):
            parts.append(warp_splat(d6, rxf, ryf, ry, scal[:, lo:hi],
                                    bands, spl, TEX, TEX, precision=PREC,
                                    lo=lo, live_flags=live_flags))
        return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    res["splat_sparse"] = timed_ingraph(splat_all, d6, "splat (sparse cotangent)")

    res["grad_e2e"] = timed_ingraph(
        jax.grad(lambda x: jnp.sum(fn(x, dhw, ray_dir, eye, z_dir)[0] * cot)),
        rgba, "fwd+bwd e2e")

    out = {k: round(v * 1000, 1) for k, v in res.items()}
    out["live_fraction"] = round(live, 4)
    out["sum_of_parts_ms"] = round(
        (res["fwd_res_sparse"] + res["composite_bwd_sparse"]
         + res["splat_sparse"]) * 1000, 1)
    out["mpix_per_s"] = round(RES * RES / 1e6 / res["grad_e2e"], 3)
    out["planes"] = N_PLANES
    out["res"] = RES
    out["precision"] = PREC
    # fwd chunk kernels + 1 composite-bwd + per-chunk splat kernels
    out["kernel_launches_per_grad"] = 2 * len(plan) + 1
    print(json.dumps(out))


if __name__ == "__main__":
    main()

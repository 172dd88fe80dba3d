#!/usr/bin/env python
"""Ablate the fat splat's inner loop on chip to locate its cost.

Each variant disables one component (results are WRONG — timing only):
hats, matmul (and its 2048-lane operand reshapes), roll, accumulate RMW.
DCE-proof feedback touches every plane of the output.
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


def timed(fn, x, name):
    @jax.jit
    def step(x):
        def body(i, acc):
            out = fn(x * (1.0 + acc * 1e-30))
            fb = sum(jnp.sum(leaf[..., ::7, 0].astype(jnp.float32))
                     for leaf in jax.tree_util.tree_leaves(out))
            return acc + fb * 1e-30

        return lax.fori_loop(0, INNER, body, jnp.zeros((), jnp.float32))

    float(np.asarray(step(x)))
    times = []
    for _ in range(OUTER):
        t0 = time.perf_counter()
        float(np.asarray(step(x)))
        times.append(time.perf_counter() - t0)
    best = min(times) / INNER
    print(f"# {name:<38} {best * 1000:8.1f} ms", flush=True)
    return best


def main():
    import gmpi_tpu.ops.pallas_warp as pw
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import plan_fused
    from gmpi_tpu.ops.pallas_warp import (
        GRAD_TAU, composite_bwd_pallas, flatten_pixels, plane_affine,
        ray_fields, render_mpi_fused_fwd, warp_splat)

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
    cot = jax.jit(lambda k: jax.random.normal(
        k, (1, 3, RES, RES), jnp.float32))(k2)
    dhw = jnp.asarray(geom.dhw)

    plan, splat_plan = plan_fused(dhw, ray_dir, eye, z_dir, TEX, TEX)
    scal = jax.vmap(lambda e: plane_affine(dhw, e, TEX, TEX))(eye)
    rx, ry, q = ray_fields(ray_dir.astype(jnp.float32),
                           z_dir.astype(jnp.float32))
    rxf, ryf, qf = flatten_pixels(rx), flatten_pixels(ry), flatten_pixels(q)
    gc6 = flatten_pixels(cot)

    warped, n_live = jax.jit(lambda x: render_mpi_fused_fwd(
        x, dhw, ray_dir, eye, z_dir, plan, early_out="grad",
        precision=PREC)[3:5])(rgba)
    comp = jax.jit(lambda w: composite_bwd_pallas(
        w, scal, qf, gc6, None, None, grad_tau=GRAD_TAU, with_live=True,
        n_live=n_live))
    d6, live_flags = comp(warped)

    def splat_all(d6):
        buf = None
        for (lo, hi, bands), spl in zip(plan, splat_plan):
            buf = warp_splat(d6, rxf, ryf, ry, scal[:, lo:hi],
                             bands, spl, TEX, TEX, precision=PREC,
                             lo=lo, live_flags=live_flags, n_live=n_live,
                             out_buf=buf, full_out=True)
        return buf

    res = {}
    for mode in (None, "no_acc", "no_roll", "no_dot", "dot_f32",
                 "no_hatx", "no_haty"):
        pw._SPLAT_ABLATE = mode
        res[str(mode)] = round(
            timed(splat_all, d6, f"splat[{mode}]") * 1000, 1)
    pw._SPLAT_ABLATE = None
    print(json.dumps(res))


if __name__ == "__main__":
    main()

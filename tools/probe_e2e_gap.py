#!/usr/bin/env python
"""Locate the ~64 ms gap between the fused grad e2e (172 ms) and its parts
(fwd_res 36 + comp 16 + splat 56 = 108 ms), all timed in-graph.

Probes:
  1. bwd_chain(warped): composite_bwd_pallas + per-chunk splat + concat —
     exactly fn_bwd's body;
  2. fwd_res + bwd_chain composed in ONE jit WITHOUT custom_vjp;
  3. the real jax.grad through the custom_vjp (reference point);
  4. grad with a stub bwd (returns zeros) — fwd + autodiff plumbing only.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_PLANES, RES, TEX, INNER, OUTER, PREC = 96, 1024, 1024, 4, 3, "bf16x3"


def timed(fn, x, name):
    @jax.jit
    def step(x):
        def body(i, acc):
            out = fn(x + acc * 1e-30)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.ravel()[0] * 1e-30
        return lax.fori_loop(0, INNER, body, jnp.zeros((), jnp.float32))

    float(np.asarray(step(x)))
    ts = []
    for _ in range(OUTER):
        t0 = time.perf_counter()
        float(np.asarray(step(x)))
        ts.append(time.perf_counter() - t0)
    best = min(ts) / INNER
    print(f"# {name:<44} {best * 1000:8.1f} ms", flush=True)
    return best


def main():
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import plan_fused
    from gmpi_tpu.ops.pallas_warp import (
        LANES, STRIP, composite_bwd_pallas, flatten_pixels,
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

    plan, splat_plan = plan_fused(dhw, ray_dir, eye, z_dir, TEX, TEX)
    fn = make_fused_renderer(plan, splat_plan, TEX, TEX, early_out=True,
                             precision=PREC)
    scal = jax.vmap(lambda e: plane_affine(dhw, e, TEX, TEX))(eye)
    rx, ry, q = ray_fields(ray_dir.astype(jnp.float32), z_dir.astype(jnp.float32))
    rxf, ryf, qf = flatten_pixels(rx), flatten_pixels(ry), flatten_pixels(q)
    gc6 = flatten_pixels(cot)

    def bwd_chain(warped):
        d6 = composite_bwd_pallas(warped, scal, qf, gc6, None, None)
        parts = []
        for (lo, hi, bands), spl in zip(plan, splat_plan):
            parts.append(warp_splat(d6[:, lo:hi], rxf, ryf, ry, scal[:, lo:hi],
                                    bands, spl, TEX, TEX, precision=PREC))
        return jnp.concatenate(parts, axis=1)

    warped0 = jax.jit(lambda k: jax.random.uniform(
        k, (1, N_PLANES, 4, RES // STRIP, RES // 64 * 8, LANES),
        jnp.float32))(jax.random.key(3))

    timed(bwd_chain, warped0, "bwd_chain (comp + splat + concat)")

    def fwd_plus_bwd_nojvp(x):
        c, d, t, warped = render_mpi_fused_fwd(
            x, dhw, ray_dir, eye, z_dir, plan, early_out=False,
            precision=PREC)
        return bwd_chain(warped) + 0.0 * jnp.sum(c)

    timed(fwd_plus_bwd_nojvp, rgba, "fwd_res + bwd_chain, one jit, no vjp")

    timed(jax.grad(lambda x: jnp.sum(fn(x, dhw, ray_dir, eye, z_dir)[0] * cot)),
          rgba, "real jax.grad (custom_vjp)")

    # stub bwd: zero cotangents — isolates fwd + autodiff plumbing
    @jax.custom_vjp
    def stub(x):
        c, d, t, _ = render_mpi_fused_fwd(x, dhw, ray_dir, eye, z_dir, plan,
                                          early_out=False, precision=PREC,
                                          with_warped=False)
        return c

    def stub_fwd(x):
        c, d, t, warped = render_mpi_fused_fwd(x, dhw, ray_dir, eye, z_dir,
                                               plan, early_out=False,
                                               precision=PREC)
        return c, warped

    def stub_bwd(res, g):
        return (jnp.zeros((1, N_PLANES, 4, TEX, TEX), jnp.float32)
                + res[:, :1, :, :1, :1, 0].mean(),)

    stub.defvjp(stub_fwd, stub_bwd)
    timed(jax.grad(lambda x: jnp.sum(stub(x) * cot)), rgba,
          "grad with stub bwd (fwd + plumbing)")


if __name__ == "__main__":
    main()

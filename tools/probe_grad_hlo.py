#!/usr/bin/env python
"""Dump the optimized HLO of the fused grad and report the largest
non-kernel ops (copies/transposes/concats) — hunting the ~70 ms gap between
the e2e grad and its component kernels."""

import re
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_PLANES, RES, TEX, PREC = 96, 1024, 1024, "bf16x3"


def main():
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import plan_fused
    from gmpi_tpu.ops.pallas_warp import make_fused_renderer

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
    grad = jax.grad(lambda x: jnp.sum(fn(x, dhw, ray_dir, eye, z_dir)[0] * cot))

    lowered = jax.jit(grad).lower(rgba)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"# HLO text: {len(txt) / 1e6:.1f} MB", flush=True)

    def nbytes(dt, dims):
        unit = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "pred": 1, "s8": 1, "u8": 1}.get(dt, 4)
        n = 1
        for d in dims.split(",") if dims else []:
            n *= int(d)
        return n * unit

    ops = []
    pat = re.compile(r"= (f32|bf16|s32|u32|pred|f16|s8|u8)\[([0-9,]*)\][^ ]* (\S+?)\(")
    for line in txt.splitlines():
        line = line.strip()
        m = pat.search(line)
        if not m:
            continue
        dt, dims, op = m.groups()
        b = nbytes(dt, dims)
        if b >= 64 * 1024 * 1024:  # >= 64 MB outputs
            ops.append((b, op, line[:140]))
    ops.sort(reverse=True)
    by_op = {}
    for b, op, _ in ops:
        by_op.setdefault(op, [0, 0])
        by_op[op][0] += 1
        by_op[op][1] += b
    print("# big-output ops by type (count, GB):")
    for op, (c, b) in sorted(by_op.items(), key=lambda kv: -kv[1][1]):
        print(f"#   {op:<22} x{c:<4} {b / 1e9:6.2f} GB")
    print("# top 25 single ops:")
    for b, op, line in ops[:25]:
        print(f"#   {b / 1e9:6.2f} GB  {line}")


if __name__ == "__main__":
    main()

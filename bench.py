"""Benchmark: MPI renderer fwd+bwd at 96 planes, 1024x1024 (the BASELINE
north-star metric) on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is null — the reference repo publishes no numeric renderer
throughput (see BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

N_PLANES = 96
RES = 1024
TEX = 1024
WARMUP = 2
ITERS = 8


def main():
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import render_mpi_chunked

    geom = geom_mod.build_plane_geometry(
        n_planes=N_PLANES, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        n_truncated_stds=2.0, enlarge_factor=1.001, confined=True,
    )
    rng = np.random.default_rng(0)
    rgba = jnp.asarray(rng.random((1, N_PLANES, 4, TEX, TEX)).astype(np.float32))
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[0.1]]), given_pitches=jnp.asarray([[0.05]]),
    )
    intr = cam.intrinsics_from_fov(12.6, RES, RES)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    cot = jnp.asarray(rng.standard_normal((1, 3, RES, RES)).astype(np.float32))

    # fwd+bwd: loss = <color, cot>; grad w.r.t. the full 96-plane RGBA stack.
    # plane-chunked (lax.scan slabs) to bound the warped-stack footprint.
    def loss(x):
        out = render_mpi_chunked(x, geom.dhw, ray_dir, eye, z_dir, plane_chunk=16, remat=True)
        return jnp.sum(out.color * cot)

    step = jax.jit(jax.value_and_grad(loss))

    for _ in range(WARMUP):
        v, g = step(rgba)
        jax.block_until_ready(g)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        v, g = step(rgba)
    jax.block_until_ready(g)
    elapsed = time.perf_counter() - t0

    mpix_per_s = ITERS * (RES * RES) / 1e6 / elapsed
    print(json.dumps({
        "metric": f"renderer fwd+bwd Mpixels/s/chip ({N_PLANES} planes, {RES}^2)",
        "value": round(mpix_per_s, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()

"""Benchmark: MPI renderer fwd+bwd at 96 planes, 1024x1024 (the BASELINE
north-star metric) on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is null — the reference repo publishes no numeric renderer
throughput (see BASELINE.md).

Uses the tile-banded MXU warp (``gmpi_tpu/ops/tiled_warp.py``) with bands
validated for the benchmark pose, plane-chunked compositing with
rematerialized backward, and an in-graph iteration loop so the remote-device
round-trip (~30 ms on the tunneled dev chip) does not pollute the measurement.
"""

from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_PLANES = 96
RES = 1024
TEX = 1024
INNER_ITERS = 4
OUTER = 3


def run(n_planes, res, tex, plane_chunk):
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import homography_grid, render_mpi_chunked
    from gmpi_tpu.ops.tiled_warp import required_bands

    geom = geom_mod.build_plane_geometry(
        n_planes=n_planes, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        n_truncated_stds=2.0, enlarge_factor=1.001, confined=True,
    )
    rng = np.random.default_rng(0)
    rgba = jnp.asarray(rng.random((1, n_planes, 4, tex, tex)).astype(np.float32))
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[0.1]]), given_pitches=jnp.asarray([[0.05]]),
    )
    intr = cam.intrinsics_from_fov(12.6, res, res)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    cot = jnp.asarray(rng.standard_normal((1, 3, res, res)).astype(np.float32))

    # measure the warp bands this pose needs (static for the jit below)
    dhw_f = jnp.asarray(geom.dhw)
    ray_f = jnp.broadcast_to(ray_dir[:, None], (1, n_planes, 3, res, res)).reshape(n_planes, 3, res, res)
    eye_f = jnp.broadcast_to(eye[:, None], (1, n_planes, 3)).reshape(n_planes, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (1, n_planes, 3)).reshape(n_planes, 3)
    grid, _ = homography_grid(dhw_f, eye_f, ray_f, z_f)

    from gmpi_tpu.ops.tiled_warp_adjoint import check_monotone, required_output_bands

    monotone = check_monotone((n_planes, 4, tex, tex), grid)
    # per-chunk bands: plane extents grow front-to-back, so near slabs use
    # much smaller bands than the all-plane worst case
    bands = []
    for k in range(n_planes // plane_chunk):
        g_k = grid[k * plane_chunk : (k + 1) * plane_chunk]
        shape_k = (plane_chunk, 4, tex, tex)
        by, bx = required_bands(shape_k, g_k, tile=(8, 256))
        if monotone:
            pbr, pbc = required_output_bands(shape_k, g_k, tile=(32, 512))
            bands.append((int(by), int(bx), int(pbr) + 4, int(pbc) + 8))
        else:
            bands.append((int(by), int(bx)))

    def loss(x):
        out = render_mpi_chunked(
            x, geom.dhw, ray_dir, eye, z_dir, plane_chunk=plane_chunk,
            tiled_bands=bands,
        )
        return jnp.sum(out.color * cot)

    grad_fn = jax.grad(loss)

    @jax.jit
    def bench_step(x):
        # in-graph iteration: amortizes host<->device round-trip overhead.
        # the carry feeds the input through a non-constant-foldable term so
        # XLA cannot hoist the gradient out of the loop (x + acc*0.0 folds).
        def body(i, acc):
            g = grad_fn(x + acc * 1e-30)
            return acc + g.ravel()[0]
        return jax.lax.fori_loop(0, INNER_ITERS, body, jnp.zeros((), jnp.float32))

    float(np.asarray(bench_step(rgba)))  # compile + sync

    times = []
    for _ in range(OUTER):
        t0 = time.perf_counter()
        float(np.asarray(bench_step(rgba)))
        times.append(time.perf_counter() - t0)
    best = min(times) / INNER_ITERS

    mpix_per_s = (res * res) / 1e6 / best
    return {
        "metric": f"renderer fwd+bwd Mpixels/s/chip ({n_planes} planes, {res}^2)",
        "value": round(mpix_per_s, 3),
        "unit": "Mpixels/s/chip",
        "vs_baseline": None,
    }


def main():
    try:
        result = run(N_PLANES, RES, TEX, plane_chunk=16)
    except Exception:
        # fall back to a smaller config rather than emitting nothing
        result = run(32, 512, 512, plane_chunk=8)
        result["metric"] += " [fallback config]"
    print(json.dumps(result))


if __name__ == "__main__":
    main()

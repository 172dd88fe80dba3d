#!/usr/bin/env python
"""A/B the splat kernel on chip: chunk split x trim, dense vs sparse d6.

r4: phases showed splat at 98.5 ms on a 0.378-live cotangent where r3
measured 56 ms dense with 5 chunks — isolate whether the regression is the
chunk merge, the trim out-spec (jnp.maximum(bi-1,0) revisiting), or the
phase harness itself.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_PLANES, RES, TEX, INNER, OUTER, PREC = 96, 1024, 1024, 2, 3, "bf16x3"


def timed(fn, x, name):
    @jax.jit
    def step(x):
        def body(i, acc):
            out = fn(x * (1.0 + acc * 1e-30))
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
    print(f"# {name:<52} {best * 1000:8.1f} ms", flush=True)
    return best


def main():
    import gmpi_tpu.ops.pallas_warp as pw
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.ops.pallas_warp import (STRIP, LANES, flatten_pixels,
                                          plan_fused_render, plan_splat,
                                          plane_affine, ray_fields, warp_splat)

    geom = geom_mod.build_plane_geometry(
        n_planes=N_PLANES, min_d=0.95, max_d=1.12,
        distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        n_truncated_stds=2.0, enlarge_factor=1.001, confined=True,
    )
    k1, k2 = jax.random.split(jax.random.key(0))
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[0.1]]), given_pitches=jnp.asarray([[0.05]]),
    )
    intr = cam.intrinsics_from_fov(12.6, RES, RES)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    dhw = jnp.asarray(geom.dhw)
    scal = jax.vmap(lambda e: plane_affine(dhw, e, TEX, TEX))(eye)
    scal_np = np.asarray(scal)
    rx, ry, _ = ray_fields(ray_dir.astype(jnp.float32), z_dir.astype(jnp.float32))
    rxf, ryf = flatten_pixels(rx), flatten_pixels(ry)

    # dense random cotangent + a 0.378-live sparse variant (first ~36 planes
    # live per strip, mirroring the grad early-out pattern)
    d6 = jax.jit(lambda k: jax.random.uniform(
        k, (1, RES // STRIP, N_PLANES, 4, RES // 64 * 8, LANES),
        jnp.float32))(k1)
    live_mask = (jnp.arange(N_PLANES) < 36).astype(jnp.float32)
    d6_sparse = d6 * live_mask[None, None, :, None, None, None]

    import itertools
    import os

    results = {}
    caps = [int(c) for c in os.environ.get("CAPS", "12,95").split(",")]
    backends = os.environ.get("BACKENDS", "fat,classic").split(",")
    for cap, backend in itertools.product(caps, backends):
        plan = plan_fused_render(scal_np, np.asarray(rx), np.asarray(ry),
                                 max_chunk_planes=cap)
        plan_t = tuple((int(lo), int(hi), b) for lo, hi, b in plan)
        splat = plan_splat(scal_np, np.asarray(ry), plan_t, TEX)
        pw._SPLAT_BACKEND = backend

        def splat_all(d):
            parts = []
            for (lo, hi, bands), spl in zip(plan_t, splat):
                parts.append(warp_splat(
                    d, rxf, ryf, ry, scal[:, lo:hi], bands, spl,
                    TEX, TEX, precision=PREC, lo=lo))
            return (jnp.concatenate(parts, axis=1)
                    if len(parts) > 1 else parts[0])

        tag = f"cap={cap} backend={backend}"
        td = timed(splat_all, d6, f"splat dense   {tag}")
        ts = timed(splat_all, d6_sparse, f"splat sparse  {tag}")
        results[tag] = {"dense_ms": round(td * 1000, 1),
                        "sparse_ms": round(ts * 1000, 1),
                        "chunks": [(lo, hi) for lo, hi, _ in plan_t]}
        if os.environ.get("DIAG") == "1":
            # all-dead cotangent: measures the floor with every subtile's
            # live-check False — if this is NOT fast, pl.when doesn't skip
            tz = timed(splat_all, jnp.zeros_like(d6), f"splat zeros   {tag}")
            # 1 DEFAULT dot instead of 3 (bf16x3): if MXU-bound, ~1/3 time
            def splat_def(d):
                parts = []
                for (lo, hi, bands), spl in zip(plan_t, splat):
                    parts.append(warp_splat(
                        d, rxf, ryf, ry, scal[:, lo:hi], bands, spl,
                        TEX, TEX, precision=lax.Precision.DEFAULT, lo=lo))
                return (jnp.concatenate(parts, axis=1)
                        if len(parts) > 1 else parts[0])
            t1 = timed(splat_def, d6, f"splat 1-dot   {tag}")
            results[tag]["zeros_ms"] = round(tz * 1000, 1)
            results[tag]["onedot_ms"] = round(t1 * 1000, 1)
    pw._SPLAT_BACKEND = None
    print(json.dumps(results))


if __name__ == "__main__":
    main()

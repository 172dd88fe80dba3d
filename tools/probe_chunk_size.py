#!/usr/bin/env python
"""A/B the fused fwd kernel over max_chunk_planes on the chip.

r4 finding: merging the benchmark plan from 5 chunks (<=24 planes) to 2
(95+1) made the dense fwd+residual measurement 3x slower (36 -> 113 ms)
even though per-plane bands are identical — something about large L per
pallas_call (out-block flush pipelining / DMA queue depth) dominates the
chunk-boundary concat savings.  This sweeps chunk caps and times the
dense and grad-sparse forward for each.
"""

import json
import sys
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
    print(f"# {name:<44} {best * 1000:8.1f} ms", flush=True)
    return best


def main():
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.ops.pallas_warp import (plan_fused_render, plane_affine,
                                          ray_fields, render_mpi_fused_fwd)

    geom = geom_mod.build_plane_geometry(
        n_planes=N_PLANES, min_d=0.95, max_d=1.12,
        distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        n_truncated_stds=2.0, enlarge_factor=1.001, confined=True,
    )
    k1, _ = jax.random.split(jax.random.key(0))
    rgba = jax.jit(lambda k: jax.random.uniform(
        k, (1, N_PLANES, 4, TEX, TEX), jnp.float32))(k1)
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[0.1]]), given_pitches=jnp.asarray([[0.05]]),
    )
    intr = cam.intrinsics_from_fov(12.6, RES, RES)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    dhw = jnp.asarray(geom.dhw)
    scal_np = np.asarray(jax.vmap(lambda e: plane_affine(dhw, e, TEX, TEX))(eye))
    rx, ry, _ = ray_fields(ray_dir.astype(jnp.float32), z_dir.astype(jnp.float32))
    rx_np, ry_np = np.asarray(rx), np.asarray(ry)

    caps = [int(a) for a in sys.argv[1:]] or [12, 24, 48, 95]
    out = {}
    for cap in caps:
        plan = plan_fused_render(scal_np, rx_np, ry_np, max_chunk_planes=cap)
        plan_t = tuple((int(lo), int(hi), b) for lo, hi, b in plan)
        tag = f"cap={cap} chunks={[(lo, hi) for lo, hi, _ in plan_t]}"
        print(f"# {tag}", flush=True)
        t_dense = timed(
            lambda x, p=plan_t: render_mpi_fused_fwd(
                x, dhw, ray_dir, eye, z_dir, p, early_out=False,
                precision=PREC)[3],
            rgba, f"dense fwd+res cap={cap}")
        t_sparse = timed(
            lambda x, p=plan_t: render_mpi_fused_fwd(
                x, dhw, ray_dir, eye, z_dir, p, early_out="grad",
                precision=PREC)[3],
            rgba, f"sparse fwd+res cap={cap}")
        out[cap] = {"chunks": [(lo, hi) for lo, hi, _ in plan_t],
                    "dense_ms": round(t_dense * 1000, 1),
                    "sparse_ms": round(t_sparse * 1000, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Virtual-mesh scaling table for the sharded renderer (VERDICT item 7).

Runs the production banded warp through tile / plane x tile sharding on the
8-virtual-device CPU mesh and reports rays/s per device count.  CPU numbers
measure the *structure* (collective placement, redundant work, combine
depth), not ICI — single-chip-only environment; see docs/SCALING.md.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_table.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import homography_grid
    from gmpi_tpu.ops.tiled_warp import required_bands
    from gmpi_tpu.parallel.mesh import make_mesh
    from gmpi_tpu.parallel.render import (
        render_mpi_plane_tile_sharded, render_mpi_tile_sharded)

    L, RES = 16, 256
    geom = geom_mod.build_plane_geometry(
        n_planes=L, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0, yaw_mean=0.0,
        yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127, n_truncated_stds=2.0,
        enlarge_factor=1.001, confined=True)
    rng = np.random.default_rng(0)
    rgba = jnp.asarray(rng.random((1, L, 4, RES, RES)).astype(np.float32))
    c2w = poses_mod.c2w_from_yaw_pitch(
        jnp.asarray([[0.1]]), jnp.asarray([[0.05]]), 1.0, 1.0)
    intr = cam.intrinsics_from_fov(12.6, RES, RES)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)

    ray_f = jnp.broadcast_to(ray_dir[:, None], (1, L, 3, RES, RES)).reshape(L, 3, RES, RES)
    eye_f = jnp.broadcast_to(eye[:, None], (1, L, 3)).reshape(L, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (1, L, 3)).reshape(L, 3)
    grid, _ = homography_grid(jnp.asarray(geom.dhw), eye_f, ray_f, z_f)
    bands = required_bands((L, 4, RES, RES), grid)

    def timeit(fn):
        fn()  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    rows = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh([n], ("tile",), devices=jax.devices()[:n])
        f = jax.jit(lambda x: render_mpi_tile_sharded(
            mesh, x, geom.dhw, ray_dir, eye, z_dir, tiled_bands=bands).color)
        t = timeit(lambda: jax.block_until_ready(f(rgba)))
        rows.append(("tile", n, RES * RES / t))
    for (np_, nt) in ((2, 4), (4, 2), (2, 2)):
        n = np_ * nt
        mesh = make_mesh([np_, nt], ("plane", "tile"), devices=jax.devices()[:n])
        f = jax.jit(lambda x: render_mpi_plane_tile_sharded(
            mesh, x, geom.dhw, ray_dir, eye, z_dir, tiled_bands=bands).color)
        t = timeit(lambda: jax.block_until_ready(f(rgba)))
        rows.append((f"plane{np_}x tile{nt}", n, RES * RES / t))

    base = rows[0][2]
    print(f"{'sharding':>16} {'devices':>8} {'rays/s':>12} {'efficiency':>11}")
    for name, n, rps in rows:
        print(f"{name:>16} {n:>8} {rps:>12.3e} {rps / (base * n):>10.1%}")


if __name__ == "__main__":
    main()

"""Round-2 measurement: band sizes, FLOP model, and fwd/bwd split at the
bench config (96 planes, 1024^2, chunk 16)."""

from __future__ import annotations

import argparse
import time

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def setup(L=96, R=1024, TEX=1024, PC=16):
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import homography_grid
    from gmpi_tpu.ops.tiled_warp import required_bands
    from gmpi_tpu.ops.tiled_warp_adjoint import check_monotone, required_output_bands

    geom = geom_mod.build_plane_geometry(
        n_planes=L, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        n_truncated_stds=2.0, enlarge_factor=1.001, confined=True,
    )
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[0.1]]), given_pitches=jnp.asarray([[0.05]]),
    )
    intr = cam.intrinsics_from_fov(12.6, R, R)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    dhw_f = jnp.asarray(geom.dhw)
    ray_f = jnp.broadcast_to(ray_dir[:, None], (1, L, 3, R, R)).reshape(L, 3, R, R)
    eye_f = jnp.broadcast_to(eye[:, None], (1, L, 3)).reshape(L, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (1, L, 3)).reshape(L, 3)
    grid, _ = homography_grid(dhw_f, eye_f, ray_f, z_f)

    monotone = check_monotone((L, 4, TEX, TEX), grid)
    bands = []
    for k in range(L // PC):
        g_k = grid[k * PC : (k + 1) * PC]
        shape_k = (PC, 4, TEX, TEX)
        by, bx = required_bands(shape_k, g_k, tile=(8, 256))
        pbr, pbc = required_output_bands(shape_k, g_k, tile=(32, 512))
        bands.append((int(by), int(bx), int(pbr) + 4, int(pbc) + 8))
    return geom, grid, bands, ray_dir, eye, z_dir, monotone


def timed(fn, *args, iters=4, name=""):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            r = fn(*jax.tree_util.tree_map(lambda x: x + acc * 1e-30, a))
            leaves = jax.tree_util.tree_leaves(r)
            return acc + sum(jnp.sum(l).astype(jnp.float32) * 1e-30 for l in leaves)
        return lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    float(loop(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append(time.perf_counter() - t0)
    t = (min(ts) - 0.030) / iters
    print(f"  {name:<52} {t*1e3:9.2f} ms", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="bands")
    args = ap.parse_args()

    L, R, TEX, PC = 96, 1024, 1024, 16
    geom, grid, bands, ray_dir, eye, z_dir, monotone = setup(L, R, TEX, PC)
    print(f"monotone={monotone}")
    # grid coord stats per chunk: slope s = d(fx)/d(x_out)
    from gmpi_tpu.ops.grid_sample import _unnormalize
    fx = np.asarray(_unnormalize(grid[..., 0], TEX, True))
    fy = np.asarray(_unnormalize(grid[..., 1], TEX, True))
    flops_fwd = 0.0
    for k, b in enumerate(bands):
        by, bx, pbr, pbc = b
        sx = float(np.mean(np.diff(fx[k * PC:(k + 1) * PC], axis=2)))
        sy = float(np.mean(np.diff(fy[k * PC:(k + 1) * PC], axis=1)))
        tiltx = float(np.mean(np.abs(np.diff(fy[k * PC:(k + 1) * PC], axis=2))))
        # fwd: per pixel 2*Bx*By*C (mm1) + 2*By*C (mm2); adjoint per texel:
        # 2*Pband*tr... count mm1 only, dominates
        f_k = PC * R * R * 2 * bx * by * 4
        flops_fwd += f_k
        print(f"chunk {k}: fwd band=({by},{bx}) adj=({pbr},{pbc}) sx={sx:.3f} "
              f"sy={sy:.3f} tilt={tiltx:.4f} mm1={f_k/1e9:.1f} GF")
    print(f"total fwd mm1 FLOPs: {flops_fwd/1e12:.2f} TF "
          f"(bf16 SOL {flops_fwd/197e12*1e3:.1f} ms, f32 {flops_fwd/49e12*1e3:.1f} ms)")
    # adjoint: per texture tile (32,512): band pixels P=pbr*pbc; wmat ⊗: P*tr*C mul
    # + mm: 2*P*(tr*C)*tc
    flops_adj = 0.0
    for k, b in enumerate(bands):
        by, bx, pbr, pbc = b
        ntiles = (TEX // 32) * (TEX // 512)
        flops_adj += PC * ntiles * (pbr * pbc) * (2 * 32 * 4 * 512 + 32 * 4)
    print(f"total adj mm FLOPs: {flops_adj/1e12:.2f} TF "
          f"(bf16 {flops_adj/197e12*1e3:.1f} ms, f32 {flops_adj/49e12*1e3:.1f} ms)")

    if args.mode == "time":
        from gmpi_tpu.core.renderer import render_mpi_chunked

        rng = np.random.default_rng(0)
        rgba = jnp.asarray(rng.random((1, L, 4, TEX, TEX)).astype(np.float32))
        cot = jnp.asarray(rng.standard_normal((1, 3, R, R)).astype(np.float32))

        def fwd(x):
            out = render_mpi_chunked(
                x, geom.dhw, ray_dir, eye, z_dir, plane_chunk=PC, tiled_bands=bands)
            return jnp.sum(out.color * cot)

        timed(fwd, rgba, name="fwd only (chunked, per-chunk bands)")
        grad_fn = jax.grad(fwd)
        timed(grad_fn, rgba, name="fwd+bwd (jax.grad)")


if __name__ == "__main__":
    main()

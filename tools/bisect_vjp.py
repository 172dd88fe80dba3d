"""Bisect the fused Pallas VJP defect across the scale axes (on-chip).

Round-2 shipped the fused kernel with ``fwd_grad_max_rel_err: 36.68`` at
96 planes x 1024^2 while every gated test (<=2 planes x 256^2) passed.  This
tool sweeps (n_planes, res) on the real device and reports, per config:

* forward color max rel err (fused vs XLA tiled oracle),
* gradient max rel err,
* the per-plane gradient error profile (which chunk of the fused plan holds
  the broken planes),
* the plan itself (chunk bounds + bands) so band-size correlation is visible.

Usage: python tools/bisect_vjp.py [--configs 8x1024 32x1024 96x1024 ...]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")


def setup(n_planes, res, tex, yaw=0.1, pitch=0.05):
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod

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
        given_yaws=jnp.asarray([[yaw]]), given_pitches=jnp.asarray([[pitch]]),
    )
    intr = cam.intrinsics_from_fov(12.6, res, res)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    cot = jnp.asarray(rng.standard_normal((1, 3, res, res)).astype(np.float32))
    return geom, rgba, ray_dir, eye, z_dir, cot


def xla_bands(geom, ray_dir, eye, z_dir, n_planes, tex, plane_chunk):
    from gmpi_tpu.core.renderer import homography_grid
    from gmpi_tpu.ops.tiled_warp import required_bands
    from gmpi_tpu.ops.tiled_warp_adjoint import check_monotone, required_output_bands

    dhw_f = jnp.asarray(geom.dhw)
    ray_f = jnp.broadcast_to(ray_dir[:, None], (1, n_planes, 3, *ray_dir.shape[2:])
                             ).reshape(n_planes, 3, *ray_dir.shape[2:])
    eye_f = jnp.broadcast_to(eye[:, None], (1, n_planes, 3)).reshape(n_planes, 3)
    z_f = jnp.broadcast_to(z_dir[:, None], (1, n_planes, 3)).reshape(n_planes, 3)
    grid, _ = homography_grid(dhw_f, eye_f, ray_f, z_f)
    monotone = check_monotone((n_planes, 4, tex, tex), grid)
    bands = []
    for k in range(n_planes // plane_chunk):
        g_k = grid[k * plane_chunk:(k + 1) * plane_chunk]
        shape_k = (plane_chunk, 4, tex, tex)
        by, bx = required_bands(shape_k, g_k, tile=(8, 256))
        if monotone:
            pbr, pbc = required_output_bands(shape_k, g_k, tile=(32, 512))
            bands.append((int(by), int(bx), int(pbr) + 4, int(pbc) + 8))
        else:
            bands.append((int(by), int(bx)))
    return bands


def run_config(n_planes, res, tex, early_out=True):
    from gmpi_tpu.core.renderer import plan_fused, render_mpi_chunked
    from gmpi_tpu.ops.pallas_warp import make_fused_renderer

    geom, rgba, ray_dir, eye, z_dir, cot = setup(n_planes, res, tex)
    dhw = jnp.asarray(geom.dhw)
    plan, splat_plan = plan_fused(dhw, ray_dir, eye, z_dir, tex, tex)
    print(f"  plan: {[(lo, hi, tuple(b)) for lo, hi, b in plan]}")
    print(f"  splat: {[tuple(s) for s in splat_plan]}")
    fn = make_fused_renderer(plan, splat_plan, tex, tex, early_out=early_out)

    def loss_fused(x):
        color, depth, trans = fn(x, dhw, ray_dir, eye, z_dir)
        return jnp.sum(color * cot), color

    plane_chunk = min(16, n_planes)
    bands = xla_bands(geom, ray_dir, eye, z_dir, n_planes, tex, plane_chunk)

    def loss_oracle(x):
        out = render_mpi_chunked(x, geom.dhw, ray_dir, eye, z_dir,
                                 plane_chunk=plane_chunk, tiled_bands=bands)
        return jnp.sum(out.color * cot), out.color

    c_f = jax.jit(lambda x: loss_fused(x)[1])(rgba)
    c_o = jax.jit(lambda x: loss_oracle(x)[1])(rgba)
    g_f = jax.jit(jax.grad(lambda x: loss_fused(x)[0]))(rgba)
    g_o = jax.jit(jax.grad(lambda x: loss_oracle(x)[0]))(rgba)
    c_f, c_o, g_f, g_o = map(np.asarray, (c_f, c_o, g_f, g_o))

    scale_c = max(float(np.max(np.abs(c_o))), 1.0)
    scale_g = max(float(np.max(np.abs(g_o))), 1e-12)
    err_c = float(np.max(np.abs(c_f - c_o))) / scale_c
    err_g = float(np.max(np.abs(g_f - g_o))) / scale_g
    print(f"  fwd rel err: {err_c:.3e}   grad rel err: {err_g:.3e}")

    # per-plane gradient error (normalized by the global grad scale)
    per_plane = np.max(np.abs(g_f - g_o).reshape(n_planes, -1), axis=1) / scale_g
    bad = np.nonzero(per_plane > 1e-3)[0]
    if bad.size:
        print(f"  bad planes (>1e-3): {bad.tolist()}")
        print("  per-plane err:", np.array2string(per_plane, precision=2,
                                                  max_line_width=100))
        # channel profile of the worst plane
        wp = int(bad[per_plane[bad].argmax()])
        ch = np.max(np.abs(g_f - g_o)[0, wp].reshape(4, -1), axis=1) / scale_g
        print(f"  worst plane {wp} channel errs (r,g,b,a): {ch}")
        # spatial: which texel rows are wrong on that plane
        rows = np.max(np.abs(g_f - g_o)[0, wp], axis=(0, 2)) / scale_g
        bad_rows = np.nonzero(rows > 1e-3)[0]
        if bad_rows.size:
            print(f"  worst plane bad texel rows: {bad_rows.min()}..{bad_rows.max()}"
                  f" ({bad_rows.size} rows)")
        cols = np.max(np.abs(g_f - g_o)[0, wp], axis=(0, 1)) / scale_g
        bad_cols = np.nonzero(cols > 1e-3)[0]
        if bad_cols.size:
            print(f"  worst plane bad texel cols: {bad_cols.min()}..{bad_cols.max()}"
                  f" ({bad_cols.size} cols)")
    return err_c, err_g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=[
        "8x1024", "32x1024", "96x1024", "96x256", "96x512"])
    ap.add_argument("--no-early-out", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    results = {}
    for cfg in args.configs:
        planes, res = map(int, cfg.split("x"))
        print(f"== {planes} planes x {res}^2 ==")
        try:
            results[cfg] = run_config(planes, res, res,
                                      early_out=not args.no_early_out)
        except Exception as e:  # noqa: BLE001 - report and keep bisecting
            print(f"  FAILED: {type(e).__name__}: {e}")
            results[cfg] = ("error", str(e)[:200])
    print("\nsummary:")
    for cfg, r in results.items():
        print(f"  {cfg}: {r}")


if __name__ == "__main__":
    main()

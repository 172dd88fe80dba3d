"""On-chip correctness + timing for the fused Pallas forward kernel."""

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


def setup(L, R, TEX, yaw=0.1, pitch=0.05):
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod

    geom = geom_mod.build_plane_geometry(
        n_planes=L, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        n_truncated_stds=2.0, enlarge_factor=1.001, confined=True,
    )
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[yaw]]), given_pitches=jnp.asarray([[pitch]]),
    )
    intr = cam.intrinsics_from_fov(12.6, R, R)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    return geom, ray_dir, eye, z_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="check")
    ap.add_argument("--L", type=int, default=8)
    ap.add_argument("--R", type=int, default=512)
    args = ap.parse_args()

    from gmpi_tpu.ops.pallas_warp import (
        estimate_fused_bands, flatten_pixels, pad_textures, plane_affine,
        ray_fields, unflatten_pixels, warp_composite_fwd)
    from gmpi_tpu.core.renderer import render_slab_partial

    L, R, TEX = args.L, args.R, args.R
    geom, ray_dir, eye, z_dir = setup(L, R, TEX)
    rng = np.random.default_rng(0)
    rgba = jnp.asarray(rng.random((1, L, 4, TEX, TEX)).astype(np.float32))

    scal = plane_affine(jnp.asarray(geom.dhw), eye[0], TEX, TEX)[None]  # [1,L,6]
    rx, ry, q = ray_fields(ray_dir, z_dir)
    bands = estimate_fused_bands(scal, rx, ry)
    print("bands:", bands)
    rx, ry, q = flatten_pixels(rx), flatten_pixels(ry), flatten_pixels(q)

    tex_pad = pad_textures(rgba)

    if args.mode == "check":
        fwd = jax.jit(lambda tp: warp_composite_fwd(tp, rx, ry, q, scal, bands))
        color, depth, trans, warped = fwd(tex_pad)
        color = unflatten_pixels(color, R, R)
        depth = unflatten_pixels(depth, R, R)
        trans = unflatten_pixels(trans, R, R)
        warped = unflatten_pixels(warped, R, R)
        c_ref, d_ref, t_ref = jax.jit(
            lambda r: render_slab_partial(r, geom.dhw, ray_dir, eye, z_dir)
        )(rgba)
        for name, a, b in [
            ("color", color, c_ref),
            ("depth", depth[:, None], d_ref),
            ("trans", trans[:, None], t_ref),
        ]:
            err = float(jnp.max(jnp.abs(a - b)))
            rel = err / (float(jnp.max(jnp.abs(b))) + 1e-12)
            print(f"{name}: max abs err {err:.3e}  rel {rel:.3e}")
        # warped oracle: single-plane grid sample
        from gmpi_tpu.core.renderer import warp_planes
        flat = rgba.reshape(L, 4, TEX, TEX)
        dhw_f = jnp.broadcast_to(jnp.asarray(geom.dhw), (L, 3))
        ray_f = jnp.broadcast_to(ray_dir[:, None], (1, L, 3, R, R)).reshape(L, 3, R, R)
        eye_f = jnp.broadcast_to(eye[:, None], (1, L, 3)).reshape(L, 3)
        z_f = jnp.broadcast_to(z_dir[:, None], (1, L, 3)).reshape(L, 3)
        rgb_o, disp_o, alpha_o = jax.jit(warp_planes)(flat, dhw_f, eye_f, ray_f, z_f)
        werr = float(jnp.max(jnp.abs(warped[0, :, :3] - rgb_o)))
        aerr = float(jnp.max(jnp.abs(warped[0, :, 3:4] - alpha_o)))
        print(f"warped rgb err {werr:.3e}  alpha err {aerr:.3e}")
    elif args.mode == "time":
        def fwd(tp):
            c, d, t, w = warp_composite_fwd(tp, rx, ry, q, scal, bands)
            return jnp.sum(c) + jnp.sum(d) + jnp.sum(t) + jnp.sum(w) * 1e-30

        @jax.jit
        def loop(tp):
            def body(i, acc):
                return acc + fwd(tp + acc * 1e-30) * 1e-30
            return lax.fori_loop(0, 4, body, jnp.zeros((), jnp.float32))

        float(loop(tex_pad))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(tex_pad))
            ts.append(time.perf_counter() - t0)
        t = (min(ts) - 0.030) / 4
        print(f"fused fwd {args.L} planes @ {R}^2: {t*1e3:.2f} ms "
              f"({args.L/t/96:.2f} rel-96-plane units)")


if __name__ == "__main__":
    main()

"""fp64 numpy referee for the MPI render: computes the exact (double
precision) forward at a config and reports each fp32 path's true error.

The fused kernel and the XLA paths compute texel coordinates via different
fp32 associations (plane_affine vs homography_grid); only a higher-precision
referee can say which is closer to the true render.
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from tools.bisect_vjp import setup, xla_bands  # noqa: E402

EPS = 1e-10


def render64(rgba, dhw, ray_dir, eye, z_dir, tex):
    """Exact fp64 forward: homography + bilinear (zeros pad) + composite."""
    rgba = np.asarray(rgba, np.float64)[0]      # [L, 4, T, T]
    dhw = np.asarray(dhw, np.float64)
    ray = np.asarray(ray_dir, np.float64)[0]    # [3, H, W]
    eye = np.asarray(eye, np.float64)[0]
    n_l = rgba.shape[0]
    h, w = ray.shape[1], ray.shape[2]
    color = np.zeros((3, h, w))
    trans = np.ones((h, w))
    for l in range(n_l):
        d, ph, pw = dhw[l]
        scale = (d - eye[2]) / ray[2]
        x = eye[0] + ray[0] * scale
        y = eye[1] + ray[1] * scale
        u = 2.0 * x / pw
        v = 2.0 * y / ph
        fx = (u + 1.0) * 0.5 * (tex - 1)
        fy = (v + 1.0) * 0.5 * (tex - 1)
        x0 = np.floor(fx).astype(np.int64)
        y0 = np.floor(fy).astype(np.int64)
        wx = fx - x0
        wy = fy - y0
        samp = np.zeros((4, h, w))
        for dy, wgt_y in ((0, 1.0 - wy), (1, wy)):
            for dx, wgt_x in ((0, 1.0 - wx), (1, wx)):
                xi = x0 + dx
                yi = y0 + dy
                ok = (xi >= 0) & (xi < tex) & (yi >= 0) & (yi < tex)
                xi_c = np.clip(xi, 0, tex - 1)
                yi_c = np.clip(yi, 0, tex - 1)
                vals = rgba[l][:, yi_c, xi_c] * ok[None]
                samp += (wgt_y * wgt_x)[None] * vals
        a = samp[3]
        color += (a * trans)[None] * samp[:3]
        trans = trans * (1.0 - a + EPS)
    return color[None]  # [1, 3, H, W]


def main(n_planes=8, res=1024, tex=1024):
    from gmpi_tpu.core.renderer import plan_fused, render_mpi_chunked
    from gmpi_tpu.ops.pallas_warp import make_fused_renderer

    geom, rgba, ray_dir, eye, z_dir, _ = setup(n_planes, res, tex)
    dhw = jnp.asarray(geom.dhw)
    plan, splat_plan = plan_fused(dhw, ray_dir, eye, z_dir, tex, tex)
    fn = make_fused_renderer(plan, splat_plan, tex, tex, early_out=False)
    c_fused = np.asarray(jax.jit(
        lambda x: fn(x, dhw, ray_dir, eye, z_dir)[0])(rgba))

    plane_chunk = min(16, n_planes)
    bands = xla_bands(geom, ray_dir, eye, z_dir, n_planes, tex, plane_chunk)
    c_tiled = np.asarray(jax.jit(lambda x: render_mpi_chunked(
        x, geom.dhw, ray_dir, eye, z_dir, plane_chunk=plane_chunk,
        tiled_bands=bands).color)(rgba))

    c64 = render64(rgba, geom.dhw, ray_dir, eye, z_dir, tex)
    scale = max(float(np.abs(c64).max()), 1.0)

    def rel(a):
        return float(np.max(np.abs(a - c64))) / scale

    print(f"config: {n_planes} planes x {res}^2 (fp64 referee)")
    print(f"  fused vs fp64: {rel(c_fused):.3e}")
    print(f"  tiled vs fp64: {rel(c_tiled):.3e}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--planes", type=int, default=8)
    ap.add_argument("--res", type=int, default=1024)
    args = ap.parse_args()
    main(args.planes, args.res, args.res)

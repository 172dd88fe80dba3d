"""Split the fused backward into its halves at 96x1024 and find where the
far-plane alpha-grad junk enters: composite_bwd (pixel-space cotangents) or
warp_splat (texture-space splat)."""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from tools.bisect_vjp import setup  # noqa: E402


def main(n_planes=96, res=1024, tex=1024):
    from gmpi_tpu.core.renderer import plan_fused
    from gmpi_tpu.ops import pallas_warp as pw

    geom, rgba, ray_dir, eye, z_dir, cot = setup(n_planes, res, tex)
    dhw = jnp.asarray(geom.dhw)
    plan, splat_plan = plan_fused(dhw, ray_dir, eye, z_dir, tex, tex)

    @jax.jit
    def fwd_residual(x):
        c, d, t, warped = pw.render_mpi_fused_fwd(
            x, dhw, ray_dir, eye, z_dir, plan, early_out=False)
        return warped

    warped = fwd_residual(rgba)
    v, l_all = warped.shape[0], warped.shape[1]
    h = w_img = res

    # warped is subtile-flat [V, L, 4, NS, R8, 128]
    wnp = np.asarray(warped)
    amax = wnp[:, :, 3].max()
    amin = wnp[:, :, 3].min()
    print(f"warped alpha range: [{amin:.6e}, {amax:.6e}]")

    scal = jax.vmap(lambda e: pw.plane_affine(dhw, e, tex, tex))(eye)
    rx, ry, q = pw.ray_fields(ray_dir.astype(jnp.float32),
                              z_dir.astype(jnp.float32))
    qf = pw.flatten_pixels(q).reshape(v, -1, 128)
    warped_f = warped.reshape(v, l_all, 4, -1, 128)
    delta = scal[:, :, 4][:, :, None, None] * qf[:, None]
    gc = pw.flatten_pixels(cot).reshape(v, 3, -1, 128)

    @jax.jit
    def half1(wf):
        return pw.composite_bwd(wf, delta, gc, None, None)

    d_samp = half1(warped_f)
    dn = np.asarray(d_samp)
    # per-plane alpha cotangent magnitude in pixel space
    pa = np.max(np.abs(dn[0, :, 3]), axis=(1, 2))
    print("plane  |d_samp_alpha|max (pixel space)")
    for l in list(range(0, 4)) + list(range(70, l_all)):
        print(f"  {l:3d}  {pa[l]:14.6e}")

    # half 2: splat the pixel cotangent
    d_samp6 = d_samp.reshape(v, l_all, 4, h // pw.STRIP, -1, 128)
    rxf, ryf = pw.flatten_pixels(rx), pw.flatten_pixels(ry)

    parts = []
    for (lo, hi, bands), spl in zip(plan, splat_plan):
        parts.append(jax.jit(lambda d6, s, b=pw.FusedBands(*bands),
                             sp=pw.SplatPlan(*spl), lo=lo, hi=hi:
                             pw.warp_splat(d6, rxf, ryf, ry, s, b, sp,
                                           tex, tex))(d_samp6[:, lo:hi],
                                                      scal[:, lo:hi]))
    g = np.concatenate([np.asarray(p) for p in parts], axis=1)
    ga = np.max(np.abs(g[0, :, 3]), axis=(1, 2))
    print("plane  |splat_alpha|max (texture space)")
    for l in list(range(0, 4)) + list(range(70, l_all)):
        print(f"  {l:3d}  {ga[l]:14.6e}")


if __name__ == "__main__":
    main()

"""Compare composite_bwd intermediates on-TPU vs numpy fp64 at the junk
location: which term (t_excl*e, u/one_m) diverges, and does the TPU jit of
the same formula on the same inputs reproduce the blowup on CPU/numpy?"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from tools.bisect_vjp import setup  # noqa: E402

EPS = 1e-10


def composite_bwd_np(alpha, rgb, gc, dtype):
    """numpy replica of composite_bwd's alpha path at chosen dtype.
    alpha [L, P], rgb [L, 3, P], gc [3, P]."""
    alpha = alpha.astype(dtype)
    rgb = rgb.astype(dtype)
    gc = gc.astype(dtype)
    one_m = (1.0 - alpha + EPS).astype(dtype)
    t_incl = np.cumprod(one_m, axis=0, dtype=dtype)
    t_excl = np.concatenate([np.ones_like(t_incl[:1]), t_incl[:-1]], axis=0)
    w = (alpha * t_excl).astype(dtype)
    e = np.einsum("cp,lcp->lp", gc, rgb).astype(dtype)
    we = (w * e).astype(dtype)
    we_rev = we[::-1]
    u_rev = np.cumsum(
        np.concatenate([np.zeros_like(we_rev[:1]), we_rev[:-1]], axis=0),
        axis=0, dtype=dtype)
    u = u_rev[::-1]
    d_alpha = t_excl * e - u / one_m
    return d_alpha, t_excl, e, u, one_m


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

    warped = fwd_residual(rgba)  # [V, L, 4, NS, R8, 128]
    v, l_all = warped.shape[0], warped.shape[1]
    warped_f = warped.reshape(v, l_all, 4, -1, 128)
    gc = pw.flatten_pixels(cot).reshape(v, 3, -1, 128)
    scal = jax.vmap(lambda e: pw.plane_affine(dhw, e, tex, tex))(eye)
    rx, ry, q = pw.ray_fields(ray_dir.astype(jnp.float32),
                              z_dir.astype(jnp.float32))
    qf = pw.flatten_pixels(q).reshape(v, -1, 128)
    delta = scal[:, :, 4][:, :, None, None] * qf[:, None]

    @jax.jit
    def half1(wf):
        return pw.composite_bwd(wf, delta, gc, None, None)

    d_samp = np.asarray(half1(warped_f))
    da_tpu = d_samp[0, :, 3]                       # [L, NSR8, 128]
    flat = np.abs(da_tpu[-1]).ravel()
    idx = int(flat.argmax())
    r_i, c_i = idx // 128, idx % 128
    print(f"worst texel at plane 95: ({r_i}, {c_i}), tpu value "
          f"{da_tpu[-1, r_i, c_i]:.6e}")

    alpha_np = np.asarray(warped_f[0, :, 3, r_i, c_i])     # [L]
    rgb_np = np.asarray(warped_f[0, :, :3, r_i, c_i])      # [L, 3]
    gc_np = np.asarray(gc[0, :, r_i, c_i])                 # [3]

    for dtype in (np.float32, np.float64):
        da, t_excl, e, u, one_m = composite_bwd_np(
            alpha_np[:, None], rgb_np[:, :, None], gc_np[:, None], dtype)
        print(f"numpy {np.dtype(dtype).name}: d_alpha[95] = {da[95, 0]:.6e}, "
              f"t_excl[95] = {t_excl[95, 0]:.6e}, u[95] = {u[95, 0]:.6e}, "
              f"one_m[95] = {one_m[95, 0]:.6e}, e[95] = {e[95, 0]:.6e}")
    print("alpha[85:96] =", np.array2string(alpha_np[85:], precision=6))
    print("tpu d_alpha[85:96] at texel =",
          np.array2string(da_tpu[85:, r_i, c_i], precision=4))
    da64 = composite_bwd_np(alpha_np[:, None], rgb_np[:, :, None],
                            gc_np[:, None], np.float64)[0][:, 0]
    print("np64 d_alpha[85:96]        =",
          np.array2string(da64[85:], precision=4))

    # also: does a plain-XLA jit of composite_bwd on this single texel
    # reproduce the TPU junk? (isolates lowering-at-scale effects)
    wf1 = jnp.asarray(
        np.concatenate([rgb_np, alpha_np[:, None]], axis=1)
    ).reshape(1, l_all, 4, 1, 1)
    gc1 = jnp.asarray(gc_np).reshape(1, 3, 1, 1)
    delta1 = jnp.zeros((1, l_all, 1, 1))
    da1 = np.asarray(jax.jit(
        lambda w: pw.composite_bwd(w, delta1, gc1, None, None))(wf1))
    print(f"tpu single-texel d_alpha[95] = {da1[0, 95, 3, 0, 0]:.6e}")


if __name__ == "__main__":
    main()

"""Ablate the TPU-jit composite_bwd miscompile on the REAL fused-kernel
residual: (a) fresh-copy input vs pallas-produced device array, (b) piecewise
jits of each intermediate to find which one goes wrong."""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")

from tools.bisect_vjp import setup  # noqa: E402

R_I, C_I = 5287, 80
EPS = 1e-10


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
    warped_f = warped.reshape(v, l_all, 4, -1, 128)
    gc = pw.flatten_pixels(cot).reshape(v, 3, -1, 128)
    scal = jax.vmap(lambda e: pw.plane_affine(dhw, e, tex, tex))(eye)
    rx, ry, q = pw.ray_fields(ray_dir.astype(jnp.float32),
                              z_dir.astype(jnp.float32))
    qf = pw.flatten_pixels(q).reshape(v, -1, 128)
    delta = scal[:, :, 4][:, :, None, None] * qf[:, None]

    f = lambda wf: pw.composite_bwd(wf, delta, gc, None, None)

    d1 = jax.jit(f)(warped_f)
    print(f"pallas-output input : {float(d1[0, 95, 3, R_I, C_I]):.6e}")

    wf_fresh = jnp.asarray(np.asarray(warped_f))
    d2 = jax.jit(f)(wf_fresh)
    print(f"fresh-copy input    : {float(d2[0, 95, 3, R_I, C_I]):.6e}")

    # piecewise on the pallas-produced array
    alpha = warped_f[:, :, 3]
    rgb = warped_f[:, :, :3]

    t_excl = jax.jit(lambda a: jnp.concatenate(
        [jnp.ones_like(a[:, :1]),
         jnp.cumprod(1.0 - a + EPS, axis=1)[:, :-1]], 1))(alpha)
    print(f"t_excl[95]          : {float(t_excl[0, 95, R_I, C_I]):.6e}")

    e = jax.jit(lambda r: jnp.einsum("vchw,vlchw->vlhw", gc, r))(rgb)
    print(f"e[95]               : {float(e[0, 95, R_I, C_I]):.6e}")

    u = jax.jit(lambda a, r: jnp.flip(jnp.cumsum(jnp.concatenate(
        [jnp.zeros_like(a[:, :1]),
         jnp.flip((a * jnp.concatenate(
             [jnp.ones_like(a[:, :1]),
              jnp.cumprod(1.0 - a + EPS, axis=1)[:, :-1]], 1))
          * jnp.einsum("vchw,vlchw->vlhw", gc, r), 1)[:, :-1]], 1),
        axis=1), 1))(alpha, rgb)
    print(f"u[95]               : {float(u[0, 95, R_I, C_I]):.6e}")

    one_m = jax.jit(lambda a: 1.0 - a + EPS)(alpha)
    print(f"one_m[95]           : {float(one_m[0, 95, R_I, C_I]):.6e}")

    da = jax.jit(lambda t, ee, uu, om: t * ee - uu / om)(t_excl, e, u, one_m)
    print(f"piecewise d_alpha   : {float(da[0, 95, R_I, C_I]):.6e}")


if __name__ == "__main__":
    main()

"""Same composite_bwd inputs, three execution modes: TPU jit (at scale),
TPU eager, CPU jit — to pin whether the far-plane junk is an XLA:TPU
at-scale lowering artifact or lives in the data."""

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
    warped_f = warped.reshape(v, l_all, 4, -1, 128)
    gc = pw.flatten_pixels(cot).reshape(v, 3, -1, 128)
    scal = jax.vmap(lambda e: pw.plane_affine(dhw, e, tex, tex))(eye)
    rx, ry, q = pw.ray_fields(ray_dir.astype(jnp.float32),
                              z_dir.astype(jnp.float32))
    qf = pw.flatten_pixels(q).reshape(v, -1, 128)
    delta = scal[:, :, 4][:, :, None, None] * qf[:, None]

    r_i, c_i = 5287, 80

    def run(fn, wf, dl, g):
        d = fn(wf, dl, g)
        return float(np.asarray(d[0, 95, 3, r_i, c_i])), float(
            np.max(np.abs(np.asarray(d[0, 95, 3]))))

    f = lambda wf, dl, g: pw.composite_bwd(wf, dl, g, None, None)

    val, mx = run(jax.jit(f), warped_f, delta, gc)
    print(f"TPU jit   : texel {val:.6e}, plane-95 max {mx:.6e}")

    with jax.disable_jit():
        val, mx = run(f, warped_f, delta, gc)
    print(f"TPU eager : texel {val:.6e}, plane-95 max {mx:.6e}")

    cpu = jax.devices("cpu")[0]
    wf_c = jax.device_put(np.asarray(warped_f), cpu)
    dl_c = jax.device_put(np.asarray(delta), cpu)
    gc_c = jax.device_put(np.asarray(gc), cpu)
    val, mx = run(jax.jit(f, backend="cpu"), wf_c, dl_c, gc_c)
    print(f"CPU jit   : texel {val:.6e}, plane-95 max {mx:.6e}")


if __name__ == "__main__":
    main()

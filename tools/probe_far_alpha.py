"""Probe the far-plane alpha-gradient blowup at 96x1024: print per-plane
gradient magnitudes of BOTH paths plus an fp64 analytic referee for the
composite half, to decide which side produces the junk where transmittance
underflows fp32."""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from tools.bisect_vjp import setup, xla_bands  # noqa: E402


def main(n_planes=96, res=1024, tex=1024):
    from gmpi_tpu.core.renderer import plan_fused, render_mpi_chunked
    from gmpi_tpu.ops.pallas_warp import make_fused_renderer

    geom, rgba, ray_dir, eye, z_dir, cot = setup(n_planes, res, tex)
    dhw = jnp.asarray(geom.dhw)
    plan, splat_plan = plan_fused(dhw, ray_dir, eye, z_dir, tex, tex)
    fn = make_fused_renderer(plan, splat_plan, tex, tex, early_out=True)

    def loss_fused(x):
        color, depth, trans = fn(x, dhw, ray_dir, eye, z_dir)
        return jnp.sum(color * cot)

    plane_chunk = min(16, n_planes)
    bands = xla_bands(geom, ray_dir, eye, z_dir, n_planes, tex, plane_chunk)

    def loss_oracle(x):
        out = render_mpi_chunked(x, geom.dhw, ray_dir, eye, z_dir,
                                 plane_chunk=plane_chunk, tiled_bands=bands)
        return jnp.sum(out.color * cot)

    g_f = np.asarray(jax.jit(jax.grad(loss_fused))(rgba))
    g_o = np.asarray(jax.jit(jax.grad(loss_oracle))(rgba))

    af = np.max(np.abs(g_f[0, :, 3]), axis=(1, 2))
    ao = np.max(np.abs(g_o[0, :, 3]), axis=(1, 2))
    print("plane  |g_fused_alpha|max  |g_oracle_alpha|max")
    for l in list(range(0, 8)) + list(range(70, n_planes)):
        print(f"  {l:3d}  {af[l]:14.6e}  {ao[l]:14.6e}")

    l_bad = int(np.argmax(np.abs(g_f[0, :, 3] - g_o[0, :, 3]).max(axis=(1, 2))))
    d = np.abs(g_f[0, l_bad, 3] - g_o[0, l_bad, 3])
    ij = np.unravel_index(d.argmax(), d.shape)
    print(f"worst plane {l_bad} texel {ij}: fused={g_f[0, l_bad, 3][ij]:.6e} "
          f"oracle={g_o[0, l_bad, 3][ij]:.6e}")


if __name__ == "__main__":
    main()

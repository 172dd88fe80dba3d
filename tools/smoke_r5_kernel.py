"""Small-scale on-chip smoke of the r5 resident fwd kernel + n_live VJP.

256^2, 8 planes: fused fwd+grad vs the gather oracle on the real v5e —
validates Mosaic lowering of the resident-block/scratch-state layout and
the n_live masking before committing to full-scale benches.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import plan_fused, render_mpi

    L, RES = 8, 256
    geom = geom_mod.build_plane_geometry(
        n_planes=L, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        n_truncated_stds=2.0, enlarge_factor=1.001, confined=True)
    rng = np.random.default_rng(0)
    rgba_np = rng.random((1, L, 4, RES, RES)).astype(np.float32)
    rgba_np[:, 1, 3] = 1.0  # opaque plane: exercises n_live + garbage slots
    rgba = jnp.asarray(rgba_np)
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[0.1]]), given_pitches=jnp.asarray([[0.05]]))
    intr = cam.intrinsics_from_fov(12.6, RES, RES)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    cot = jnp.asarray(rng.standard_normal((1, 3, RES, RES)).astype(np.float32))
    dhw = jnp.asarray(geom.dhw)

    plan, splat = plan_fused(dhw, ray_dir, eye, z_dir, RES, RES)
    from gmpi_tpu.ops.pallas_warp import make_fused_renderer

    fn = make_fused_renderer(plan, splat, RES, RES, early_out=True,
                             precision="bf16x3")

    t0 = time.time()
    c_f = jax.jit(lambda x: fn(x, dhw, ray_dir, eye, z_dir)[0])(rgba)
    c_f.block_until_ready()
    print(f"fwd compile+run {time.time()-t0:.0f}s", flush=True)
    o = render_mpi(rgba, dhw, ray_dir, eye, z_dir, True)
    errc = float(jnp.max(jnp.abs(c_f - o.color)))
    print("fwd max abs err", errc, flush=True)

    t0 = time.time()
    g_f = jax.jit(jax.grad(
        lambda x: jnp.sum(fn(x, dhw, ray_dir, eye, z_dir)[0] * cot)))(rgba)
    g_f.block_until_ready()
    print(f"grad compile+run {time.time()-t0:.0f}s", flush=True)
    g_o = jax.grad(lambda x: jnp.sum(
        render_mpi(x, dhw, ray_dir, eye, z_dir, True).color * cot))(rgba)
    sg = float(jnp.max(jnp.abs(g_o)))
    errg = float(jnp.max(jnp.abs(g_f - g_o))) / sg
    print("grad max rel err", errg, flush=True)
    assert errc < 5e-4 and errg < 5e-4, (errc, errg)

    # disp-enabled variant lowers and matches too
    fn_d = make_fused_renderer(plan, splat, RES, RES, early_out=True,
                               precision="bf16x3", with_disp=True)
    outs = jax.jit(lambda x: fn_d(x, dhw, ray_dir, eye, z_dir))(rgba)
    errd = float(jnp.max(jnp.abs(outs[2][:, 0] - o.disp[:, 0])))
    print("disp max abs err", errd, flush=True)
    assert errd < 5e-4
    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()

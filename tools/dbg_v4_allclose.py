"""Debug the V=4 256^2 allclose failure: per-view fwd/grad errors."""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gmpi_tpu.core import camera as cam
from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.core import poses as poses_mod
from gmpi_tpu.core.renderer import plan_fused, render_mpi
from gmpi_tpu.ops.pallas_warp import make_fused_renderer

n_views, n_planes, tex, res_s = 4, 96, 1024, 256
geom = geom_mod.build_plane_geometry(
    n_planes=n_planes, min_d=0.95, max_d=1.12, distance_sample_method="inverse",
    fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
    yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
    n_truncated_stds=2.0, enlarge_factor=1.001, confined=True)
k1, k2 = jax.random.split(jax.random.key(7))
rgba = jax.jit(lambda k: jax.random.uniform(
    k, (n_views, n_planes, 4, tex, tex), jnp.float32))(k1)
yaws = jnp.linspace(-0.5, 0.55, n_views).reshape(-1, 1)
pitches = jnp.linspace(-0.22, 0.24, n_views).reshape(-1, 1)
c2w, _, _ = poses_mod.sample_sphere_poses(
    None, n_views, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
    given_yaws=yaws, given_pitches=pitches)
dhw = jnp.asarray(geom.dhw)
intr_s = cam.intrinsics_from_fov(12.6, res_s, res_s)
ray_s, eye_s, z_s = cam.generate_rays(intr_s, c2w)
cot_s = jax.jit(lambda k: jax.random.normal(
    k, (n_views, 3, res_s, res_s), jnp.float32))(k2)
plan_s, splat_s = plan_fused(dhw, ray_s, eye_s, z_s, tex, tex)
print("# chunks", len(plan_s), flush=True)
fn_s = make_fused_renderer(plan_s, splat_s, tex, tex, early_out=True,
                           precision="bf16x3")

c_m = jax.jit(lambda x: fn_s(x, dhw, ray_s, eye_s, z_s)[0])(rgba)
c_o = jax.jit(lambda x: render_mpi(x, dhw, ray_s, eye_s, z_s, True).color)(rgba)
for v in range(n_views):
    sc = float(jnp.max(jnp.abs(c_o[v])))
    err = float(jnp.max(jnp.abs(c_m[v] - c_o[v])))
    print(f"view {v}: fwd rel {err/sc:.2e} (scale {sc:.3f})", flush=True)

g_m = jax.jit(jax.grad(lambda x: jnp.sum(fn_s(x, dhw, ray_s, eye_s, z_s)[0] * cot_s)))(rgba)
g_o = jax.jit(jax.grad(lambda x: jnp.sum(
    render_mpi(x, dhw, ray_s, eye_s, z_s, True).color * cot_s)))(rgba)
sg = float(jnp.max(jnp.abs(g_o)))
for v in range(n_views):
    err = float(jnp.max(jnp.abs(g_m[v] - g_o[v])))
    print(f"view {v}: grad rel {err/sg:.2e}", flush=True)
# per-plane worst for the worst view
errs = jnp.max(jnp.abs(g_m - g_o), axis=(2, 3, 4)) / sg  # [V, L]
ev = np.asarray(errs)
vi, li = np.unravel_index(np.argmax(ev), ev.shape)
print(f"worst (view, plane) = ({vi}, {li}) rel {ev[vi, li]:.2e}", flush=True)

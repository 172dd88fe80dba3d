"""On-chip full-scale test tier (VERDICT r2 #3).

Round 2 shipped a fused VJP that was correct at <=2 planes x 256² in
interpret mode and wrong at 96 x 1024² on the real chip — only the bench gate
caught it.  This tier runs the production configuration on the actual device
so a broken-at-scale kernel fails *a test*, not just the benchmark:

    GMPI_TPU_TESTS=1 python -m pytest -m tpu -n 0 tests/test_tpu_full_scale.py

Covers: fused fwd+grad allclose vs the gather oracle at 96 x 1024² (the bench
pose AND a +/-2-sigma corner pose), the on-device band/splat-plan validators,
and both MXU precision modes (bf16x3 production, HIGHEST parity).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

_ON_CHIP = os.environ.get("GMPI_TPU_TESTS") == "1"


def _tpu_available():
    if not _ON_CHIP:
        return False
    try:
        return any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        return False


skip_no_tpu = pytest.mark.skipif(
    not _tpu_available(),
    reason="needs GMPI_TPU_TESTS=1 and a real accelerator",
)

N_PLANES = 96
RES = TEX = 1024
TOL = 5e-4  # see bench.py: fp32 coordinate-roundoff floor is ~1.3e-4


def _setup(yaw, pitch):
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import geometry as geom_mod
    from gmpi_tpu.core import poses as poses_mod

    geom = geom_mod.build_plane_geometry(
        n_planes=N_PLANES, min_d=0.95, max_d=1.12,
        distance_sample_method="inverse",
        fov_deg=12.6, sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        n_truncated_stds=2.0, enlarge_factor=1.001, confined=True,
    )
    # device-side RNG: host-materialized 1.6 GB uploads crawl through the
    # remote-tunnel dev chip (see bench.py _setup)
    k1, k2 = jax.random.split(jax.random.key(0))
    rgba = jax.jit(lambda k: jax.random.uniform(
        k, (1, N_PLANES, 4, TEX, TEX), jnp.float32))(k1)
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, 1, poses_mod.SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        given_yaws=jnp.asarray([[yaw]]), given_pitches=jnp.asarray([[pitch]]),
    )
    intr = cam.intrinsics_from_fov(12.6, RES, RES)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    cot = jax.jit(lambda k: jax.random.normal(k, (1, 3, RES, RES), jnp.float32))(k2)
    return geom, rgba, ray_dir, eye, z_dir, cot


def _oracle(geom, rgba, ray_dir, eye, z_dir, cot):
    from gmpi_tpu.core.renderer import render_mpi_chunked

    def loss(x):
        out = render_mpi_chunked(x, geom.dhw, ray_dir, eye, z_dir, plane_chunk=4)
        return jnp.sum(out.color * cot), out.color

    c = jax.jit(lambda x: loss(x)[1])(rgba)
    g = jax.jit(jax.grad(lambda x: loss(x)[0]))(rgba)
    return c, g


@skip_no_tpu
@pytest.mark.parametrize("yaw,pitch,precision", [
    (0.1, 0.05, "bf16x3"),                 # the bench pose, production mode
    (0.578, 0.254, "bf16x3"),              # +2 sigma corner of the pose range
    (0.1, 0.05, None),                     # HIGHEST parity mode
])
def test_fused_full_scale_fwd_and_grad_allclose(yaw, pitch, precision):
    from jax import lax

    from gmpi_tpu.core.renderer import plan_fused
    from gmpi_tpu.ops.pallas_warp import (
        fused_bands_ok, make_fused_renderer, plane_affine, ray_fields,
        splat_plans_ok)

    geom, rgba, ray_dir, eye, z_dir, cot = _setup(yaw, pitch)
    dhw = jnp.asarray(geom.dhw)
    plan, splat_plan = plan_fused(dhw, ray_dir, eye, z_dir, TEX, TEX)

    scal = jax.vmap(lambda e: plane_affine(dhw, e, TEX, TEX))(eye)
    rx, ry, _ = ray_fields(ray_dir.astype(jnp.float32), z_dir.astype(jnp.float32))
    assert bool(jax.jit(lambda: fused_bands_ok(scal, rx, ry, plan))())
    assert bool(jax.jit(lambda: splat_plans_ok(scal, ry, plan, splat_plan))())

    prec = precision if precision is not None else lax.Precision.HIGHEST
    fn = make_fused_renderer(plan, splat_plan, TEX, TEX, early_out=True,
                             precision=prec)

    def loss(x):
        color, _, _ = fn(x, dhw, ray_dir, eye, z_dir)
        return jnp.sum(color * cot), color

    c_f = jax.jit(lambda x: loss(x)[1])(rgba)
    g_f = jax.jit(jax.grad(lambda x: loss(x)[0]))(rgba)
    c_o, g_o = _oracle(geom, rgba, ray_dir, eye, z_dir, cot)

    scale_c = float(jnp.max(jnp.abs(c_o)))
    scale_g = float(jnp.max(jnp.abs(g_o)))
    err_c = float(jnp.max(jnp.abs(c_f - c_o))) / max(scale_c, 1e-12)
    err_g = float(jnp.max(jnp.abs(g_f - g_o))) / max(scale_g, 1e-12)
    assert err_c <= TOL, f"fwd rel err {err_c} at yaw={yaw} pitch={pitch}"
    assert err_g <= TOL, f"grad rel err {err_g} at yaw={yaw} pitch={pitch}"


@skip_no_tpu
def test_xla_tiled_full_scale_matches_oracle():
    """The XLA fallback path gets the same full-scale gate as the fused one
    (VERDICT r2 #8) — as a test, not only inside bench.py."""
    import bench

    res = bench.run_xla(N_PLANES, RES, TEX, plane_chunk=16)
    assert res["bands_ok"]
    assert res["allclose"], res


@skip_no_tpu
def test_fused_train_gradient_matches_gather_path():
    """VERDICT r3 #3: with the fused renderer now the training default on
    accelerators, the gradient the G phase backpropagates through the
    renderer — d softplus(-D(render(mpi)*2-1)) / d mpi, D pose-conditioned —
    must match the gather path at the MPI boundary (everything upstream of
    the renderer then agrees by the chain rule)."""
    import dataclasses

    from gmpi_tpu.config import (ExperimentConfig, ModelPreset, PlaneConfig,
                                 SphereCameraConfig, StepHparams, TrainHparams)
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.bands import fused_plans_for_config
    from gmpi_tpu.core.renderer import render_mpi, render_mpi_fused
    from gmpi_tpu.train.step import flat_pose_from_c2w, init_train_state

    res = 128
    cfg = ExperimentConfig(
        name="fused_grad_check", resolution=res, fov_deg=12.6,
        camera=SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        planes=PlaneConfig(n_planes=8, min_d=0.95, max_d=1.12),
        hparams=StepHparams(batch_size=2, img_size=res, tex_size=res,
                            batch_split=1, gen_lr=0.002, disc_lr=0.002),
        train=TrainHparams(z_dim=32, w_dim=32, n_view_per_z=2, total_iters=1),
        model=ModelPreset(channel_base=1024, channel_max=64, num_bf16_res=0,
                          conv_clamp=None, gen_alpha_largest_res=res,
                          mbstd_group_size=2),
    )
    geom = cfg.plane_geometry()
    state = init_train_state(cfg, jax.random.key(0))
    disc_cfg = cfg.discriminator_cfg()

    k1, k2, k3 = jax.random.split(jax.random.key(5), 3)
    mpi = jax.random.uniform(k1, (2, 8, 4, res, res), jnp.float32)
    c2w, yaws, pitches = poses_mod.sample_sphere_poses(k2, 2, cfg.camera)
    intr = cam.intrinsics_from_fov(cfg.fov_deg, res, res)
    ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
    flat_pose = flat_pose_from_c2w(c2w, cfg.train.d_cond_pose_dim)
    plans = fused_plans_for_config(cfg)

    def g_loss(x, render):
        out = render(x)
        imgs = out.color * 2.0 - 1.0
        scores = disc_cfg.apply(state.params_d, imgs, flat_pose)
        return jnp.sum(jax.nn.softplus(-scores))

    grad_fused = jax.jit(jax.grad(lambda x: g_loss(
        x, lambda m: render_mpi_fused(m, geom.dhw, ray_dir, eye, z_dir, plans))))(mpi)
    grad_gather = jax.jit(jax.grad(lambda x: g_loss(
        x, lambda m: render_mpi(m, geom.dhw, ray_dir, eye, z_dir))))(mpi)

    scale = float(jnp.max(jnp.abs(grad_gather)))
    err = float(jnp.max(jnp.abs(grad_fused - grad_gather))) / max(scale, 1e-12)
    assert err <= TOL, f"G-phase renderer gradient rel err {err}"

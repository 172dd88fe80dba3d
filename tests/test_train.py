"""End-to-end GAN train-step tests on a tiny config: finiteness, parameter
movement, EMA tracking, and determinism under a fixed key."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gmpi_tpu.config import ExperimentConfig, ModelPreset, PlaneConfig, StepHparams, TrainHparams
from gmpi_tpu.core.poses import SphereCameraConfig
from gmpi_tpu.train import init_train_state, make_train_step


def tiny_config(batch_split=1, lighting=False):
    return ExperimentConfig(
        name="tiny",
        resolution=16,
        fov_deg=12.6,
        camera=SphereCameraConfig(
            sphere_center_z=1.0, sphere_r=1.0,
            yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
        ),
        planes=PlaneConfig(n_planes=4, min_d=0.95, max_d=1.12),
        hparams=StepHparams(batch_size=4, img_size=16, tex_size=16,
                            batch_split=batch_split, gen_lr=0.002, disc_lr=0.002),
        train=TrainHparams(z_dim=32, w_dim=32, n_view_per_z=2,
                           aug_with_lighting=lighting, lighting_start_iter=0,
                           total_iters=10),
        model=ModelPreset(channel_base=512, channel_max=32, num_bf16_res=0,
                          conv_clamp=None, gen_alpha_largest_res=16,
                          mbstd_group_size=2),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    state = init_train_state(cfg, jax.random.key(0))
    step_fn = make_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    return cfg, state, step_fn, real, pose


def test_train_step_runs_and_is_finite(setup):
    cfg, state, step_fn, real, pose = setup
    new_state, metrics = step_fn(state, real, pose, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1
    assert float(metrics["r1"]) > 0


def test_params_and_ema_move(setup):
    cfg, state, step_fn, real, pose = setup
    new_state, _ = step_fn(state, real, pose, jax.random.key(1))

    def delta(a, b):
        return max(
            float(jnp.max(jnp.abs(x - y)))
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    assert delta(new_state.params_g, state.params_g) > 0
    assert delta(new_state.params_d, state.params_d) > 0
    # EMA moved but less than params (decay .999)
    d_ema = delta(new_state.ema, state.params_g)
    d_par = delta(new_state.params_g, state.params_g)
    assert 0 < d_ema < d_par
    # w_avg got its first update
    assert float(jnp.abs(new_state.buffers_g["mapping"]["w_avg"]).sum()) > 0


def test_train_step_deterministic(setup):
    cfg, state, step_fn, real, pose = setup
    _, m1 = step_fn(state, real, pose, jax.random.key(7))
    _, m2 = step_fn(state, real, pose, jax.random.key(7))
    assert float(m1["d_loss"]) == float(m2["d_loss"])
    assert float(m1["g_loss"]) == float(m2["g_loss"])


@pytest.mark.slow
def test_batch_split_matches_full_batch_loss_scale():
    """Gradient accumulation across micro-batches totals the same loss
    normalization as one batch (``train.py:777``)."""
    cfg2 = tiny_config(batch_split=2)
    state = init_train_state(cfg2, jax.random.key(0))
    step_fn = make_train_step(cfg2, donate=False)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    _, metrics = step_fn(state, real, pose, jax.random.key(1))
    assert np.isfinite(float(metrics["g_loss"]))


@pytest.mark.slow
def test_lighting_augmentation_path():
    cfg = tiny_config(lighting=True)
    state = init_train_state(cfg, jax.random.key(0))
    step_fn = make_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    # step > lighting_start_iter to exercise the lit branch
    state = state._replace(step=jnp.asarray(5, jnp.int32))
    _, metrics = step_fn(state, real, pose, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_train_step_with_plane_chunked_renderer():
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, renderer_plane_chunk=2))
    state = init_train_state(cfg, jax.random.key(0))
    step_fn = make_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    _, metrics = step_fn(state, real, pose, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_edge_aware_loss_in_g_phase():
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, use_edge_aware_loss=True, edge_aware_loss_w=0.5))
    state = init_train_state(cfg, jax.random.key(0))
    step_fn = make_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    _, metrics = step_fn(state, real, pose, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_frozen_d_and_g_iters():
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, train_d=False, g_iters=2))
    state = init_train_state(cfg, jax.random.key(0))
    step_fn = make_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    new_state, metrics = step_fn(state, real, pose, jax.random.key(1))
    # D unchanged, G moved
    for a, b in zip(jax.tree_util.tree_leaves(state.params_d),
                    jax.tree_util.tree_leaves(new_state.params_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(state.params_g), jax.tree_util.tree_leaves(new_state.params_g)))
    assert moved > 0


def test_disparity_ztype_conditioning():
    from gmpi_tpu.core.geometry import multi_res_xyz

    geom = __import__("tests.test_models", fromlist=["tiny_geometry"]).tiny_geometry(4)
    xyz_d = multi_res_xyz(geom, 16, normalized=False, ztype="depth")
    xyz_i = multi_res_xyz(geom, 16, normalized=False, ztype="disparity")
    np.testing.assert_allclose(np.asarray(xyz_i[16][..., 2]),
                               1.0 / np.asarray(xyz_d[16][..., 2]), rtol=1e-6)


@pytest.mark.slow
def test_train_step_with_fused_renderer(monkeypatch):
    """One full GAN step rendering through the fused Pallas kernel
    (interpret mode on CPU; bands planned over the pose range)."""
    import dataclasses

    import gmpi_tpu.core.renderer as renderer_mod
    from gmpi_tpu.train.step import init_train_state, make_train_step

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        resolution=256,
        hparams=dataclasses.replace(cfg.hparams, batch_size=1, img_size=256,
                                    tex_size=256),
        planes=dataclasses.replace(cfg.planes, n_planes=2),
        train=dataclasses.replace(cfg.train, n_view_per_z=1,
                                  select_worst_view=False,
                                  aug_with_lighting=False,
                                  use_fused_renderer=True),
    )

    orig = renderer_mod.render_mpi_fused
    monkeypatch.setattr(
        renderer_mod, "render_mpi_fused",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    state = init_train_state(cfg, jax.random.key(0))
    step_fn = make_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.uniform(-1, 1, (1, 3, 256, 256)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((1, 16)).astype(np.float32))
    new_state, metrics = step_fn(state, real, pose, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    # G actually received gradients through the fused renderer's VJP
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params_g["synthesis"], new_state.params_g["synthesis"])
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_d_batch_split_matches_unsplit():
    """The D phase's micro-batched fake generation (VERDICT r2 #5, mirroring
    ``gmpi/train.py:503-518``) computes the same losses as the full batch.
    At init ``noise_strength == 0``, so per-slice noise keys are inert and
    the comparison is exact up to XLA scheduling."""
    losses = {}
    for split_on in (True, False):
        cfg = tiny_config(batch_split=2)
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, d_batch_split=split_on, select_worst_view=False,
            n_view_per_z=1))
        state = init_train_state(cfg, jax.random.key(0))
        step_fn = make_train_step(cfg, donate=False)
        rng = np.random.default_rng(0)
        real = jnp.asarray(rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32))
        pose = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
        _, metrics = step_fn(state, real, pose, jax.random.key(1))
        losses[split_on] = {k: float(v) for k, v in metrics.items()}
    for k in ("d_loss", "d_loss_real", "d_loss_fake", "r1"):
        np.testing.assert_allclose(losses[True][k], losses[False][k],
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_r1_remat_matches_plain():
    """``r1_remat`` changes memory, not math."""
    losses = {}
    for remat in (True, False):
        cfg = tiny_config()
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, r1_remat=remat, select_worst_view=False, n_view_per_z=1))
        state = init_train_state(cfg, jax.random.key(0))
        step_fn = make_train_step(cfg, donate=False)
        rng = np.random.default_rng(0)
        real = jnp.asarray(rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32))
        pose = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
        _, metrics = step_fn(state, real, pose, jax.random.key(1))
        losses[remat] = float(metrics["r1"])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


def test_worst_view_low_res_selection_agrees():
    """Low-res candidate rendering (VERDICT r2 #7) selects the same argmin
    views as full-res on a fixed seed: candidates only need to be *rankable*
    by D.  Mirrors ``worst_views`` with public pieces at both resolutions."""
    from gmpi_tpu.core import camera as cam
    from gmpi_tpu.core import poses as poses_mod
    from gmpi_tpu.core.renderer import render_mpi
    from gmpi_tpu.train.step import flat_pose_from_c2w

    cfg = tiny_config()
    state = init_train_state(cfg, jax.random.key(0))
    gen_cfg = cfg.generator_cfg()
    disc_cfg = cfg.discriminator_cfg()
    geom = cfg.plane_geometry()
    xyz_dict = cfg.multi_res_xyz(geom)
    bs, v = 8, 4
    z = jax.random.normal(jax.random.key(3), (bs, cfg.train.z_dim), jnp.float32)
    mpi = gen_cfg.apply(state.params_g, state.buffers_g, z, None, xyz_dict,
                        cfg.planes.n_planes, noise_mode="const")
    mpi_rep = jnp.repeat(mpi, v, axis=0)
    yaws, pitches = poses_mod.sample_yaw_pitch(jax.random.key(4), bs * v, cfg.camera)
    c2w, _, _ = poses_mod.sample_sphere_poses(
        None, bs * v, cfg.camera, given_yaws=yaws, given_pitches=pitches)
    flat_pose = flat_pose_from_c2w(c2w, cfg.train.d_cond_pose_dim)

    def argmin_at(res):
        intr = cam.intrinsics_from_fov(cfg.fov_deg, res, res)
        ray_dir, eye, z_dir = cam.generate_rays(intr, c2w)
        color = render_mpi(mpi_rep, geom.dhw, ray_dir, eye, z_dir).color
        if res != cfg.hparams.img_size:
            color = jax.image.resize(
                color, (*color.shape[:2], cfg.hparams.img_size, cfg.hparams.img_size),
                method="bilinear")
        imgs = color * 2.0 - 1.0
        scores = disc_cfg.apply(state.params_d, imgs, flat_pose).reshape(bs, v)
        return np.asarray(jnp.argmin(scores, axis=1))

    full = argmin_at(cfg.hparams.img_size)   # 16
    low = argmin_at(cfg.hparams.img_size // 2)
    # statistical agreement: at least 7/8 z pick the same view
    assert (full == low).mean() >= 7 / 8, (full, low)


def test_worst_view_low_res_step_runs():
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, worst_view_render_res=8))
    state = init_train_state(cfg, jax.random.key(0))
    step_fn = make_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    _, metrics = step_fn(state, real, pose, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_debug_ray_check_step_stays_finite():
    """debug_ray_check on: a well-fitted volume renders finite colors (the
    NaN-poison only fires when a ray exits the last plane)."""
    cfg = tiny_config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, debug_ray_check=True))
    state = init_train_state(cfg, jax.random.key(0))
    step_fn = make_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.uniform(-1, 1, (4, 3, 16, 16)).astype(np.float32))
    pose = jnp.asarray(rng.standard_normal((4, 16)).astype(np.float32))
    _, metrics = step_fn(state, real, pose, jax.random.key(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

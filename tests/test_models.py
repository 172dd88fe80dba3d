"""Generator / discriminator tests: torch-oracle parity for the mapping
network, structural invariants of the MPI head (shared RGB, background plane,
full last-plane alpha), plane-count flexibility, and grad flow.

Full-generator output parity against released checkpoints is exercised by the
checkpoint converter tests (offline weights permitting); here oracles
re-express reference *semantics* with torch primitives
(``networks_cond_on_pos_enc.py:203-367``).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.models.discriminator import DiscriminatorCfg
from gmpi_tpu.models.generator import GeneratorCfg, MappingNetwork, SynthesisNetworkCfg


def tiny_gen_cfg(res=32, alpha_res=16, cond_mode="normalize_add_z", embed_func="modulated_lrelu",
                 sep_background=True, only_alpha=True):
    return GeneratorCfg(
        z_dim=64,
        w_dim=64,
        img_resolution=res,
        synthesis=SynthesisNetworkCfg(
            w_dim=64, img_resolution=res, channel_base=1024, channel_max=64,
            conv_clamp=256, gen_alpha_largest_res=alpha_res,
            cond_mode=cond_mode, embed_func=embed_func,
            sep_background=sep_background, build_bg_from_rgb=sep_background,
            only_alpha=only_alpha,
        ),
    )


def tiny_geometry(n_planes=6):
    return geom_mod.build_plane_geometry(
        n_planes=n_planes, min_d=0.95, max_d=1.12, fov_deg=12.6,
        sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
    )


# ---------------------------------------------------------------------------
# Mapping network vs torch oracle
# ---------------------------------------------------------------------------


def test_mapping_matches_torch_oracle():
    m = MappingNetwork(z_dim=32, c_dim=0, w_dim=32, num_ws=5, num_layers=3)
    params, buffers = m.init(jax.random.key(0))
    z = np.random.default_rng(1).standard_normal((4, 32)).astype(np.float32)

    ws = np.asarray(m.apply(params, buffers, jnp.asarray(z)))
    assert ws.shape == (4, 5, 32)

    # oracle: normalize 2nd moment -> 3x [x @ (w*gain).T + b*lr; lrelu; *sqrt2]
    x = torch.from_numpy(z)
    x = x * (x.square().mean(dim=1, keepdim=True) + 1e-8).rsqrt()
    lr = 0.01
    for i in range(3):
        w = torch.from_numpy(np.asarray(params[f"fc{i}"]["weight"]))
        b = torch.from_numpy(np.asarray(params[f"fc{i}"]["bias"]))
        x = x @ (w * (lr / np.sqrt(32))).t() + b * lr
        x = F.leaky_relu(x, 0.2) * np.sqrt(2.0)
    want = x.unsqueeze(1).repeat(1, 5, 1).numpy()
    np.testing.assert_allclose(ws, want, rtol=1e-4, atol=1e-5)


def test_mapping_truncation_and_w_avg():
    m = MappingNetwork(z_dim=16, c_dim=0, w_dim=16, num_ws=3, num_layers=2)
    params, buffers = m.init(jax.random.key(0))
    z = jax.random.normal(jax.random.key(1), (8, 16))
    ws_full = m.apply(params, buffers, z)
    ws_trunc = m.apply(params, buffers, z, truncation_psi=0.0)
    # psi=0 collapses to w_avg (zeros at init)
    np.testing.assert_allclose(np.asarray(ws_trunc), 0.0, atol=1e-6)
    new_avg = m.updated_w_avg(buffers, ws_full)
    want = np.asarray(ws_full[:, 0].mean(axis=0)) * (1 - m.w_avg_beta)
    np.testing.assert_allclose(np.asarray(new_avg), want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Generator MPI-head invariants
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gen_setup():
    cfg = tiny_gen_cfg()
    params, buffers = cfg.init(jax.random.key(0))
    geom = tiny_geometry()
    xyz = geom_mod.multi_res_xyz(geom, cfg.img_resolution)
    z = jax.random.normal(jax.random.key(1), (2, cfg.z_dim))
    mpi = cfg.apply(params, buffers, z, None, xyz, geom.n_planes, rng=jax.random.key(2))
    return cfg, params, buffers, geom, xyz, z, mpi


def test_generator_output_shape_and_range(gen_setup):
    cfg, *_rest, mpi = gen_setup
    assert mpi.shape == (2, 6, 4, 32, 32)
    assert float(mpi.min()) >= 0.0 and float(mpi.max()) <= 1.0


def test_shared_rgb_across_foreground_planes(gen_setup):
    """cond_on_pos_enc_only_alpha: one shared RGB for all foreground planes,
    separate background as the last plane (``networks_cond_on_pos_enc.py:950-964``)."""
    *_rest, mpi = gen_setup
    rgb = np.asarray(mpi[:, :, :3])
    np.testing.assert_allclose(rgb[:, 0], rgb[:, 4], atol=1e-6)
    assert not np.allclose(rgb[:, 0], rgb[:, 5], atol=1e-4)


def test_background_alpha_full(gen_setup):
    *_rest, mpi = gen_setup
    np.testing.assert_allclose(np.asarray(mpi[:, -1, 3]), 1.0, atol=1e-6)


def test_plane_count_flexible(gen_setup):
    """Depth conditioning means n_planes can change at inference
    (train 32 -> eval 96 in the reference, ``eval.sh:51``)."""
    cfg, params, buffers, geom, xyz, z, mpi6 = gen_setup
    geom12 = tiny_geometry(n_planes=12)
    xyz12 = geom_mod.multi_res_xyz(geom12, cfg.img_resolution)
    mpi12 = cfg.apply(params, buffers, z, None, xyz12, 12, rng=jax.random.key(2))
    assert mpi12.shape == (2, 12, 4, 32, 32)
    # shared foreground RGB is plane-count independent
    np.testing.assert_allclose(np.asarray(mpi12[:, 0, :3]), np.asarray(mpi6[:, 0, :3]), atol=1e-5)


def test_alpha_heads_stop_at_gen_alpha_largest_res():
    """Blocks above gen_alpha_largest_res contribute no alpha: with heads only
    up to 16, the 32-res block adds zero alpha, so the final alpha equals the
    upsampled 16-res accumulation — structurally, toalpha params exist only
    for res <= 16."""
    cfg = tiny_gen_cfg(res=32, alpha_res=16)
    params, _ = cfg.init(jax.random.key(0))
    assert "toalpha" in params["synthesis"]["b16"]
    assert "toalpha" not in params["synthesis"]["b32"]
    assert "pos_enc_embed" not in params["synthesis"]["b32"]


@pytest.mark.parametrize(
    "cond_mode,embed_func",
    [
        ("add_z", "mlp"),
        ("normalize_add_z", "conv_lrelu"),
        ("normalize_add_xyz", "modulated_lrelu"),
        ("cat_xyz", "mlp"),
        ("cond_z", "mlp"),
        ("cond_xyz", "conv_lrelu"),
    ],
)
def test_generator_variants_run(cond_mode, embed_func):
    sep = cond_mode != "cat_xyz"
    cfg = tiny_gen_cfg(res=16, alpha_res=16, cond_mode=cond_mode, embed_func=embed_func,
                       sep_background=sep, only_alpha=sep)
    params, buffers = cfg.init(jax.random.key(0))
    geom = tiny_geometry(4)
    xyz = geom_mod.multi_res_xyz(geom, 16)
    z = jax.random.normal(jax.random.key(1), (2, cfg.z_dim))
    mpi = cfg.apply(params, buffers, z, None, xyz, 4, rng=jax.random.key(2))
    assert mpi.shape == (2, 4, 4, 16, 16)
    assert np.isfinite(np.asarray(mpi)).all()


@pytest.mark.slow
def test_generator_grads_flow(gen_setup):
    cfg, params, buffers, geom, xyz, z, _ = gen_setup

    def loss_fn(p):
        mpi = cfg.apply(p, buffers, z, None, xyz, 6, noise_mode="const")
        return jnp.mean(jnp.square(mpi))

    grads = jax.grad(loss_fn)(params)
    g_alpha = grads["synthesis"]["b16"]["toalpha"]["weight"]
    g_map = grads["mapping"]["fc0"]["weight"]
    assert float(jnp.abs(g_alpha).sum()) > 0
    assert float(jnp.abs(g_map).sum()) > 0


def test_generator_stop_grad_flags(gen_setup):
    cfg, params, buffers, geom, xyz, z, _ = gen_setup

    def loss_fn(p):
        mpi = cfg.apply(p, buffers, z, None, xyz, 6, noise_mode="const",
                        stop_mapping_grad=True, stop_trunk_grad=True)
        return jnp.mean(jnp.square(mpi))

    grads = jax.grad(loss_fn)(params)
    assert float(jnp.abs(grads["mapping"]["fc0"]["weight"]).sum()) == 0.0
    assert float(jnp.abs(grads["synthesis"]["b4"]["conv1"]["weight"]).sum()) == 0.0
    # heads still train (the reference trains only the heads from scratch)
    assert float(jnp.abs(grads["synthesis"]["b16"]["toalpha"]["weight"]).sum()) > 0


# ---------------------------------------------------------------------------
# Discriminator
# ---------------------------------------------------------------------------


def test_discriminator_shapes_and_pose_conditioning():
    cfg = DiscriminatorCfg(c_dim=16, img_resolution=32, channel_base=1024, channel_max=64,
                           conv_clamp=256, mbstd_group_size=2)
    p = cfg.init(jax.random.key(0))
    img = jax.random.normal(jax.random.key(1), (4, 3, 32, 32))
    pose_a = jax.random.normal(jax.random.key(2), (4, 16))
    pose_b = jax.random.normal(jax.random.key(3), (4, 16))
    sa = cfg.apply(p, img, pose_a)
    sb = cfg.apply(p, img, pose_b)
    assert sa.shape == (4, 1)
    assert not np.allclose(np.asarray(sa), np.asarray(sb))


def test_discriminator_unconditional():
    cfg = DiscriminatorCfg(c_dim=0, img_resolution=16, channel_base=512, channel_max=32,
                           mbstd_group_size=2)
    p = cfg.init(jax.random.key(0))
    img = jax.random.normal(jax.random.key(1), (2, 3, 16, 16))
    assert cfg.apply(p, img).shape == (2, 1)


def test_minibatch_std_matches_torch():
    from gmpi_tpu.models.layers import minibatch_std

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 8, 5, 5)).astype(np.float32)
    got = np.asarray(minibatch_std(jnp.asarray(x), group_size=2, num_channels=1))

    tx = torch.from_numpy(x)
    G, F_, c = 2, 1, 8
    y = tx.reshape(G, -1, F_, c, 5, 5)
    y = y - y.mean(dim=0)
    y = y.square().mean(dim=0)
    y = (y + 1e-8).sqrt().mean(dim=[2, 3, 4])
    y = y.reshape(-1, F_, 1, 1).repeat(G, 1, 5, 5)
    want = torch.cat([tx, y], dim=1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_discriminator_r1_grad():
    """R1 needs d(D)/d(img); double-grad support comes free from JAX autodiff
    (the reference hand-rolls CUDA grad kernels for this)."""
    cfg = DiscriminatorCfg(c_dim=0, img_resolution=16, channel_base=512, channel_max=32,
                           mbstd_group_size=2)
    p = cfg.init(jax.random.key(0))
    img = jax.random.normal(jax.random.key(1), (2, 3, 16, 16))

    def r1(p, img):
        g = jax.grad(lambda im: jnp.sum(cfg.apply(p, im)))(img)
        return jnp.sum(jnp.square(g))

    val, grads = jax.value_and_grad(r1)(p, img)
    assert np.isfinite(float(val)) and float(val) > 0
    assert float(jnp.abs(grads["b16"]["conv0"]["weight"]).sum()) > 0


# ---------------------------------------------------------------------------
# learnable_param / vanilla / depth2alpha variants
# ---------------------------------------------------------------------------


def test_learnable_param_variant_and_plane_interp():
    from gmpi_tpu.core.geometry import plane_interp_weights
    from gmpi_tpu.models.generator import SynthesisNetworkCfg as SNC

    cfg = GeneratorCfg(
        z_dim=64, w_dim=64, img_resolution=16,
        synthesis=SNC(w_dim=64, img_resolution=16, channel_base=1024, channel_max=64,
                      conv_clamp=None, gen_alpha_largest_res=16,
                      embed_func="learnable_param", n_planes_train=6),
    )
    params, buffers = cfg.init(jax.random.key(0))
    assert params["synthesis"]["b16"]["pos_enc_embed_learnable_param"].shape == (1, 6, 64, 1, 1)
    geom = tiny_geometry(6)
    xyz = geom_mod.multi_res_xyz(geom, 16)
    z = jax.random.normal(jax.random.key(1), (2, 64))
    mpi = cfg.apply(params, buffers, z, None, xyz, 6, noise_mode="const")
    assert mpi.shape == (2, 6, 4, 16, 16)

    # eval-time plane-count change via token interpolation (6 -> 10)
    ws_interp = plane_interp_weights(0.95, 1.12, 6, 10)
    geom10 = tiny_geometry(10)
    xyz10 = geom_mod.multi_res_xyz(geom10, 16)
    mpi10 = cfg.apply(params, buffers, z, None, xyz10, 10, noise_mode="const",
                      z_interpolation_ws=ws_interp)
    assert mpi10.shape == (2, 10, 4, 16, 16)
    assert np.isfinite(np.asarray(mpi10)).all()


@pytest.mark.parametrize("head_type", ["vanilla", "depth2alpha"])
def test_vanilla_family_variants(head_type):
    from gmpi_tpu.models.generator_vanilla import VanillaGeneratorCfg

    cfg = VanillaGeneratorCfg(
        z_dim=64, w_dim=64, img_resolution=16, n_planes=5,
        channel_base=1024, channel_max=64, conv_clamp=None, head_type=head_type,
        background_alpha_full=True,
    )
    params, buffers = cfg.init(jax.random.key(0))
    geom = tiny_geometry(5)
    xyz = geom_mod.multi_res_xyz(geom, 16)
    z = jax.random.normal(jax.random.key(1), (2, 64))
    mpi = cfg.apply(params, buffers, z, None, xyz, 5, noise_mode="const")
    assert mpi.shape == (2, 5, 4, 16, 16)
    m = np.asarray(mpi)
    assert m.min() >= 0 and m.max() <= 1 + 1e-5
    # shared foreground RGB + separate background
    np.testing.assert_allclose(m[:, 0, :3], m[:, 2, :3], atol=1e-6)
    assert not np.allclose(m[:, 0, :3], m[:, 4, :3], atol=1e-4)
    np.testing.assert_allclose(m[:, -1, 3], 1.0, atol=1e-6)
    if head_type == "depth2alpha":
        # alphas must be monotone in plane depth for fixed predicted depth
        diffs = np.diff(m[:2, :-1, 3].mean(axis=(2, 3)), axis=1)
        assert (diffs >= -1e-5).all()

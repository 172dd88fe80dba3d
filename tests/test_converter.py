"""Checkpoint-converter tests.

The strongest check imports the *reference implementation itself* (read-only,
``/root/reference``) as a numerical oracle: instantiate the reference torch
Generator/Discriminator at a small config, convert their randomly-initialized
``state_dict`` through our converter, and require our JAX forward to match the
torch forward to float32 tolerance on the same inputs.  This is the
"stylegan2_sanity_check" analogue (SURVEY §4) runnable without downloaded
checkpoints.
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.models.converter import (
    convert_discriminator_checkpoint,
    convert_generator_checkpoint,
    convert_state_dict,
    merge_converted,
    tree_to_state_dict,
)
from gmpi_tpu.models.discriminator import DiscriminatorCfg
from gmpi_tpu.models.generator import GeneratorCfg, SynthesisNetworkCfg

from tests._reference import import_reference, reference_available

needs_reference = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


def _import_reference_networks():
    return import_reference("gmpi.models.networks.networks_cond_on_pos_enc")


def small_cfgs(res=32, alpha_res=32):
    gen = GeneratorCfg(
        z_dim=64,
        w_dim=64,
        img_resolution=res,
        synthesis=SynthesisNetworkCfg(
            w_dim=64, img_resolution=res, channel_base=1024, channel_max=64,
            num_bf16_res=0, conv_clamp=None, gen_alpha_largest_res=alpha_res,
        ),
    )
    disc = DiscriminatorCfg(
        c_dim=16, img_resolution=res, channel_base=1024, channel_max=64,
        num_bf16_res=0, conv_clamp=None, cmap_dim=16, mbstd_group_size=2,
    )
    return gen, disc


def test_roundtrip_state_dict():
    gen, _ = small_cfgs()
    params, buffers = gen.init(jax.random.key(0))
    sd = tree_to_state_dict(params, buffers)
    p2, b2 = convert_state_dict(sd)
    merged_p, missing = merge_converted(params, p2)
    assert not missing
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(merged_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@needs_reference
def test_reference_generator_state_dict_converts_exactly():
    """Every reference G parameter/buffer lands in our tree; nothing missing."""
    ref_nets = _import_reference_networks()
    import contextlib, io

    with contextlib.redirect_stdout(io.StringIO()):
        g = ref_nets.Generator(
            z_dim=64, c_dim=0, w_dim=64, img_resolution=32,
            n_planes=6, plane_channels=4, pos_enc_multires=0,
            torgba_cond_on_pos_enc="normalize_add_z",
            torgba_cond_on_pos_enc_embed_func="modulated_lrelu",
            torgba_sep_background=True, build_background_from_rgb=True,
            build_background_from_rgb_ratio=0.05,
            cond_on_pos_enc_only_alpha=True, gen_alpha_largest_res=32,
            background_alpha_full=True, G_final_img_act="tanh",
            mapping_kwargs={"num_layers": 8},
            synthesis_kwargs={"channel_base": 1024, "channel_max": 64, "num_fp16_res": 0, "conv_clamp": None},
        )
    sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}
    gen_cfg, _ = small_cfgs()
    params, buffers = convert_generator_checkpoint(sd, gen_cfg)  # require_all
    # round trip: our export covers every non-static reference entry
    ours = set(tree_to_state_dict(params, buffers).keys())
    theirs = {k for k in sd if not k.endswith("resample_filter")}
    assert ours == theirs


@needs_reference
def test_generator_forward_matches_reference():
    """Same converted weights + same inputs => same MPI (fp32 tolerance)."""
    import torch

    ref_nets = _import_reference_networks()
    import contextlib, io

    with contextlib.redirect_stdout(io.StringIO()):
        g = ref_nets.Generator(
            z_dim=64, c_dim=0, w_dim=64, img_resolution=32,
            n_planes=6, plane_channels=4, pos_enc_multires=0,
            torgba_cond_on_pos_enc="normalize_add_z",
            torgba_cond_on_pos_enc_embed_func="modulated_lrelu",
            torgba_sep_background=True, build_background_from_rgb=True,
            build_background_from_rgb_ratio=0.05,
            cond_on_pos_enc_only_alpha=True, gen_alpha_largest_res=32,
            background_alpha_full=True, G_final_img_act="tanh",
            mapping_kwargs={"num_layers": 8},
            synthesis_kwargs={"channel_base": 1024, "channel_max": 64, "num_fp16_res": 0, "conv_clamp": None},
        ).eval()
    sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}
    gen_cfg, _ = small_cfgs()
    params, buffers = convert_generator_checkpoint(sd, gen_cfg)

    geom = geom_mod.build_plane_geometry(
        n_planes=6, min_d=0.95, max_d=1.12, fov_deg=12.6,
        sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
    )
    xyz = geom_mod.multi_res_xyz(geom, 32)
    z_np = np.random.default_rng(0).standard_normal((2, 64)).astype(np.float32)

    ours = np.asarray(
        gen_cfg.apply(params, buffers, jnp.asarray(z_np), None, xyz, 6, noise_mode="none")
    )

    xyz_torch = {r: torch.from_numpy(np.asarray(v)) for r, v in xyz.items()}
    with torch.no_grad():
        theirs = g(
            z=torch.from_numpy(z_np), c=None,
            mpi_xyz_coords=xyz_torch, xyz_coords_only_z=False, n_planes=6,
            noise_mode="none",
        ).numpy()

    assert ours.shape == theirs.shape == (2, 6, 4, 32, 32)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


@needs_reference
@pytest.mark.parametrize("cond_mode,embed_func", [
    ("cond_z", "mlp"),
    ("cond_z", "conv_lrelu"),
    ("cond_xyz", "mlp"),
    ("cond_xyz", "conv_lrelu"),
])
def test_cond_generator_forward_matches_reference(cond_mode, embed_func):
    """AdaIN conditioning modes (``networks_cond_on_pos_enc.py:820-861``):
    converted reference weights => identical MPI outputs."""
    import torch

    ref_nets = _import_reference_networks()
    import contextlib, io

    with contextlib.redirect_stdout(io.StringIO()):
        g = ref_nets.Generator(
            z_dim=64, c_dim=0, w_dim=64, img_resolution=32,
            n_planes=6, plane_channels=4, pos_enc_multires=0,
            torgba_cond_on_pos_enc=cond_mode,
            torgba_cond_on_pos_enc_embed_func=embed_func,
            torgba_sep_background=True, build_background_from_rgb=True,
            build_background_from_rgb_ratio=0.05,
            cond_on_pos_enc_only_alpha=True, gen_alpha_largest_res=32,
            background_alpha_full=True, G_final_img_act="tanh",
            mapping_kwargs={"num_layers": 8},
            synthesis_kwargs={"channel_base": 1024, "channel_max": 64, "num_fp16_res": 0, "conv_clamp": None},
        ).eval()
    sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}
    gen_cfg = GeneratorCfg(
        z_dim=64, w_dim=64, img_resolution=32,
        synthesis=SynthesisNetworkCfg(
            w_dim=64, img_resolution=32, channel_base=1024, channel_max=64,
            num_bf16_res=0, conv_clamp=None, gen_alpha_largest_res=32,
            cond_mode=cond_mode, embed_func=embed_func,
        ),
    )
    params, buffers = convert_generator_checkpoint(sd, gen_cfg)

    geom = geom_mod.build_plane_geometry(
        n_planes=6, min_d=0.95, max_d=1.12, fov_deg=12.6,
        sphere_center_z=1.0, sphere_r=1.0,
        yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127,
    )
    xyz = geom_mod.multi_res_xyz(geom, 32)
    z_np = np.random.default_rng(0).standard_normal((2, 64)).astype(np.float32)

    ours = np.asarray(
        gen_cfg.apply(params, buffers, jnp.asarray(z_np), None, xyz, 6, noise_mode="none")
    )

    xyz_torch = {r: torch.from_numpy(np.asarray(v)) for r, v in xyz.items()}
    with torch.no_grad():
        theirs = g(
            z=torch.from_numpy(z_np), c=None,
            mpi_xyz_coords=xyz_torch, xyz_coords_only_z=False, n_planes=6,
            noise_mode="none",
        ).numpy()

    assert ours.shape == theirs.shape == (2, 6, 4, 32, 32)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


@needs_reference
def test_discriminator_forward_matches_reference():
    import torch

    ref_nets = _import_reference_networks()
    import contextlib, io

    with contextlib.redirect_stdout(io.StringIO()):
        d = ref_nets.Discriminator(
            16, 32, 3, channel_base=1024, channel_max=64, num_fp16_res=0,
            conv_clamp=None, cmap_dim=16, use_mbstd_in_D=True,
            epilogue_kwargs={"mbstd_group_size": 2},
        ).eval()
    sd = {k: v.detach().numpy() for k, v in d.state_dict().items()}
    _, disc_cfg = small_cfgs()
    params = convert_discriminator_checkpoint(sd, disc_cfg)

    rng = np.random.default_rng(1)
    img = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    pose = rng.standard_normal((4, 16)).astype(np.float32)

    ours = np.asarray(disc_cfg.apply(params, jnp.asarray(img), jnp.asarray(pose)))
    with torch.no_grad():
        theirs = d(torch.from_numpy(img), None, torch.from_numpy(pose))[0].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


@needs_reference
def test_warm_start_partial_copy():
    """Vanilla-StyleGAN2-style partial state dict: trunk absorbed, new heads
    keep their init (``misc.copy_params_and_buffers(require_all=False)``)."""
    ref_nets = _import_reference_networks()
    import contextlib, io

    with contextlib.redirect_stdout(io.StringIO()):
        g = ref_nets.Generator(
            z_dim=64, c_dim=0, w_dim=64, img_resolution=32,
            n_planes=6, plane_channels=4, pos_enc_multires=0,
            torgba_cond_on_pos_enc="normalize_add_z",
            torgba_cond_on_pos_enc_embed_func="modulated_lrelu",
            torgba_sep_background=True, build_background_from_rgb=True,
            build_background_from_rgb_ratio=0.05,
            cond_on_pos_enc_only_alpha=True, gen_alpha_largest_res=32,
            background_alpha_full=True, G_final_img_act="tanh",
            mapping_kwargs={"num_layers": 8},
            synthesis_kwargs={"channel_base": 1024, "channel_max": 64, "num_fp16_res": 0, "conv_clamp": None},
        )
    sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}
    # drop the MPI heads — emulating a vanilla StyleGAN2 source checkpoint
    partial = {k: v for k, v in sd.items() if "toalpha" not in k and "pos_enc_embed" not in k}
    gen_cfg, _ = small_cfgs()
    params, buffers = convert_generator_checkpoint(sd, gen_cfg)
    params_w, _ = convert_generator_checkpoint(partial, gen_cfg, warm_start=True, key=jax.random.key(5))
    params_init, _ = gen_cfg.init(jax.random.key(5))
    # trunk copied
    np.testing.assert_array_equal(
        np.asarray(params_w["synthesis"]["b8"]["conv0"]["weight"]),
        np.asarray(params["synthesis"]["b8"]["conv0"]["weight"]),
    )
    # heads kept at init
    np.testing.assert_array_equal(
        np.asarray(params_w["synthesis"]["b16"]["toalpha"]["weight"]),
        np.asarray(params_init["synthesis"]["b16"]["toalpha"]["weight"]),
    )


def _ref_common_kwargs():
    return dict(
        z_dim=64, c_dim=0, w_dim=64, img_resolution=32,
        n_planes=6, plane_channels=4, pos_enc_multires=0,
        torgba_sep_background=True, build_background_from_rgb=True,
        build_background_from_rgb_ratio=0.05,
        cond_on_pos_enc_only_alpha=True, gen_alpha_largest_res=32,
        G_final_img_act="tanh",
        mapping_kwargs={"num_layers": 8},
        synthesis_kwargs={"channel_base": 1024, "channel_max": 64, "num_fp16_res": 0, "conv_clamp": None},
    )


@needs_reference
def test_vanilla_generator_forward_matches_reference():
    import contextlib, io

    import torch

    ref = import_reference("gmpi.models.networks.networks_vanilla")
    from gmpi_tpu.models.generator_vanilla import VanillaGeneratorCfg

    kwargs = _ref_common_kwargs()
    kwargs.update(torgba_cond_on_pos_enc="none", torgba_cond_on_pos_enc_embed_func="none",
                  background_alpha_full=False)
    with contextlib.redirect_stdout(io.StringIO()):
        g = ref.Generator(**kwargs).eval()
    sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}

    cfg = VanillaGeneratorCfg(z_dim=64, w_dim=64, img_resolution=32, n_planes=6,
                              channel_base=1024, channel_max=64, num_bf16_res=0,
                              conv_clamp=None, head_type="vanilla")
    params, buffers = convert_generator_checkpoint(sd, cfg)

    geom = geom_mod.build_plane_geometry(
        n_planes=6, min_d=0.95, max_d=1.12, fov_deg=12.6, sphere_center_z=1.0,
        sphere_r=1.0, yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127)
    xyz = geom_mod.multi_res_xyz(geom, 32)
    z_np = np.random.default_rng(3).standard_normal((2, 64)).astype(np.float32)

    ours = np.asarray(cfg.apply(params, buffers, jnp.asarray(z_np), None, xyz, 6, noise_mode="none"))
    with torch.no_grad():
        theirs = g(torch.from_numpy(z_np), None, None, False, 6, noise_mode="none").numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


@needs_reference
def test_depth2alpha_generator_forward_matches_reference():
    import contextlib, io

    import torch

    ref = import_reference("gmpi.models.networks.networks_vanilla_depth2alpha")
    from gmpi_tpu.models.generator_vanilla import VanillaGeneratorCfg

    kwargs = _ref_common_kwargs()
    kwargs.update(torgba_cond_on_pos_enc="none", torgba_cond_on_pos_enc_embed_func="none",
                  background_alpha_full=False,
                  depth2alpha_z_range=1.0, depth2alpha_n_z_bins=256)
    with contextlib.redirect_stdout(io.StringIO()):
        g = ref.Generator(**kwargs).eval()
    sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}

    cfg = VanillaGeneratorCfg(z_dim=64, w_dim=64, img_resolution=32, n_planes=6,
                              channel_base=1024, channel_max=64, num_bf16_res=0,
                              conv_clamp=None, head_type="depth2alpha",
                              depth2alpha_z_range=1.0, depth2alpha_n_z_bins=256)
    params, buffers = convert_generator_checkpoint(sd, cfg)

    geom = geom_mod.build_plane_geometry(
        n_planes=6, min_d=0.95, max_d=1.12, fov_deg=12.6, sphere_center_z=1.0,
        sphere_r=1.0, yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127)
    xyz = geom_mod.multi_res_xyz(geom, 32)
    z_np = np.random.default_rng(4).standard_normal((2, 64)).astype(np.float32)

    ours = np.asarray(cfg.apply(params, buffers, jnp.asarray(z_np), None, xyz, 6, noise_mode="none"))
    xyz_torch = {r: torch.from_numpy(np.asarray(v)) for r, v in xyz.items()}
    with torch.no_grad():
        theirs = g(torch.from_numpy(z_np), None, xyz_torch, False, 6, noise_mode="none").numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


@needs_reference
def test_learnable_param_generator_forward_matches_reference():
    import contextlib, io

    import torch

    ref = import_reference("gmpi.models.networks.networks_pos_enc_learnable_param")
    from gmpi_tpu.models.generator import GeneratorCfg, SynthesisNetworkCfg

    kwargs = _ref_common_kwargs()
    kwargs.update(torgba_cond_on_pos_enc="normalize_add_z",
                  torgba_cond_on_pos_enc_embed_func="learnable_param",
                  background_alpha_full=True)
    # the reference plumbs the token count through synthesis_kwargs only
    kwargs["synthesis_kwargs"] = dict(kwargs["synthesis_kwargs"], n_planes=6)
    with contextlib.redirect_stdout(io.StringIO()):
        g = ref.Generator(**kwargs).eval()
    sd = {k: v.detach().numpy() for k, v in g.state_dict().items()}

    cfg = GeneratorCfg(
        z_dim=64, w_dim=64, img_resolution=32,
        synthesis=SynthesisNetworkCfg(
            w_dim=64, img_resolution=32, channel_base=1024, channel_max=64,
            num_bf16_res=0, conv_clamp=None, gen_alpha_largest_res=32,
            embed_func="learnable_param", n_planes_train=6,
        ),
    )
    params, buffers = convert_generator_checkpoint(sd, cfg)

    geom = geom_mod.build_plane_geometry(
        n_planes=6, min_d=0.95, max_d=1.12, fov_deg=12.6, sphere_center_z=1.0,
        sphere_r=1.0, yaw_mean=0.0, yaw_std=0.289, pitch_mean=0.0, pitch_std=0.127)
    xyz = geom_mod.multi_res_xyz(geom, 32)
    z_np = np.random.default_rng(5).standard_normal((2, 64)).astype(np.float32)

    ours = np.asarray(cfg.apply(params, buffers, jnp.asarray(z_np), None, xyz, 6, noise_mode="none"))
    xyz_torch = {r: torch.from_numpy(np.asarray(v)) for r, v in xyz.items()}
    with torch.no_grad():
        theirs = g(torch.from_numpy(z_np), None, xyz_torch, False, 6, noise_mode="none").numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


# ---------------------------------------------------------------------------
# TF-legacy conversion (pure name mapping, gmpi_tpu/models/legacy_tf.py)
# ---------------------------------------------------------------------------


def _synthetic_tf_generator(res=16, fmaps=8, z=8, nmap=2):
    """TF-style variable dict with the names legacy.py:163-205 consumes."""
    rng = np.random.default_rng(0)

    def arr(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    tf = {"dlatent_avg": arr(z)}
    for i in range(nmap):
        tf[f"mapping/Dense{i}/weight"] = arr(z, z)
        tf[f"mapping/Dense{i}/bias"] = arr(z)
    tf["synthesis/4x4/Const/const"] = arr(1, fmaps, 4, 4)
    tf["synthesis/4x4/Conv/weight"] = arr(3, 3, fmaps, fmaps)
    tf["synthesis/4x4/Conv/bias"] = arr(fmaps)
    tf["synthesis/4x4/Conv/noise_strength"] = arr()
    tf["synthesis/4x4/Conv/mod_weight"] = arr(z, fmaps)
    tf["synthesis/4x4/Conv/mod_bias"] = arr(fmaps)
    tf["synthesis/noise0"] = arr(1, 1, 4, 4)
    tf["synthesis/4x4/ToRGB/weight"] = arr(1, 1, fmaps, 3)
    tf["synthesis/4x4/ToRGB/bias"] = arr(3)
    tf["synthesis/4x4/ToRGB/mod_weight"] = arr(z, fmaps)
    tf["synthesis/4x4/ToRGB/mod_bias"] = arr(fmaps)
    r = 8
    while r <= res:
        lg = int(np.log2(r))
        for conv, k in (("Conv0_up", 2 * lg - 5), ("Conv1", 2 * lg - 4)):
            tf[f"synthesis/{r}x{r}/{conv}/weight"] = arr(3, 3, fmaps, fmaps)
            tf[f"synthesis/{r}x{r}/{conv}/bias"] = arr(fmaps)
            tf[f"synthesis/{r}x{r}/{conv}/noise_strength"] = arr()
            tf[f"synthesis/{r}x{r}/{conv}/mod_weight"] = arr(z, fmaps)
            tf[f"synthesis/{r}x{r}/{conv}/mod_bias"] = arr(fmaps)
            tf[f"synthesis/noise{k}"] = arr(1, 1, r, r)
        tf[f"synthesis/{r}x{r}/ToRGB/weight"] = arr(1, 1, fmaps, 3)
        tf[f"synthesis/{r}x{r}/ToRGB/bias"] = arr(3)
        tf[f"synthesis/{r}x{r}/ToRGB/mod_weight"] = arr(z, fmaps)
        tf[f"synthesis/{r}x{r}/ToRGB/mod_bias"] = arr(fmaps)
        r *= 2
    return tf


def test_tf_legacy_generator_mapping():
    from gmpi_tpu.models.legacy_tf import convert_tf_generator_params

    tf = _synthetic_tf_generator(res=16)
    sd = convert_tf_generator_params(tf, 16)

    np.testing.assert_array_equal(sd["mapping.w_avg"], tf["dlatent_avg"])
    np.testing.assert_array_equal(
        sd["mapping.fc0.weight"], tf["mapping/Dense0/weight"].T)
    np.testing.assert_array_equal(
        sd["synthesis.b4.const"], tf["synthesis/4x4/Const/const"][0])
    # conv0 weights flip spatially then HWIO->OIHW
    w = tf["synthesis/8x8/Conv0_up/weight"]
    np.testing.assert_array_equal(
        sd["synthesis.b8.conv0.weight"], w[::-1, ::-1].transpose(3, 2, 0, 1))
    # mod_bias gets +1 (TF stores style bias around 0; torch around 1)
    np.testing.assert_array_equal(
        sd["synthesis.b16.conv1.affine.bias"],
        tf["synthesis/16x16/Conv1/mod_bias"] + 1)
    np.testing.assert_array_equal(
        sd["synthesis.b16.conv1.noise_const"], tf["synthesis/noise4"][0, 0])
    # every produced name is in the reference torch naming our converter reads
    from gmpi_tpu.models.converter import torch_key_to_path

    for k in sd:
        assert torch_key_to_path(k) is not None, k


def test_tf_legacy_discriminator_mapping():
    from gmpi_tpu.models.legacy_tf import convert_tf_discriminator_params

    rng = np.random.default_rng(1)

    def arr(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    res, fm = 8, 8
    tf = {
        "8x8/FromRGB/weight": arr(1, 1, 3, fm), "8x8/FromRGB/bias": arr(fm),
        "8x8/Conv0/weight": arr(3, 3, fm, fm), "8x8/Conv0/bias": arr(fm),
        "8x8/Conv1_down/weight": arr(3, 3, fm, fm), "8x8/Conv1_down/bias": arr(fm),
        "8x8/Skip/weight": arr(1, 1, fm, fm),
        "4x4/Conv/weight": arr(3, 3, fm + 1, fm), "4x4/Conv/bias": arr(fm),
        "4x4/Dense0/weight": arr(fm * 16, fm), "4x4/Dense0/bias": arr(fm),
        "Output/weight": arr(fm, 1), "Output/bias": arr(1),
    }
    sd = convert_tf_discriminator_params(tf, res)
    np.testing.assert_array_equal(
        sd["b8.fromrgb.weight"], tf["8x8/FromRGB/weight"].transpose(3, 2, 0, 1))
    np.testing.assert_array_equal(sd["b4.out.weight"], tf["Output/weight"].T)
    np.testing.assert_array_equal(
        sd["b8.conv1.weight"], tf["8x8/Conv1_down/weight"].transpose(3, 2, 0, 1))


def test_tf_legacy_pickle_roundtrip(tmp_path):
    """A synthetic TF-era pickle converts through convert_checkpoint's own
    unpickler with no reference code on the path."""
    import pickle
    import subprocess
    import sys as _sys

    tfv = _synthetic_tf_generator(res=16)

    class Network(dict):
        pass

    Network.__module__ = "dnnlib.tflib.network"
    Network.__qualname__ = "Network"

    # structure: components {mapping, synthesis}; variables are (name, value)
    def stub(variables, components=None, **extra):
        n = Network()
        n["variables"] = variables
        n["components"] = components or {}
        n.update(extra)
        return n

    g_vars = [(k, v) for k, v in tfv.items() if "/" not in k]
    m_vars = [(k.split("/", 1)[1], v) for k, v in tfv.items() if k.startswith("mapping/")]
    s_vars = [(k.split("/", 1)[1], v) for k, v in tfv.items() if k.startswith("synthesis/")]
    net = stub(g_vars, {"mapping": stub(m_vars), "synthesis": stub(s_vars)},
               static_kwargs={"resolution": 16})

    # fake dnnlib module so pickle can serialize the class reference
    pkl_path = tmp_path / "net.pkl"
    mod = types.ModuleType("dnnlib.tflib.network")
    mod.Network = Network
    _sys.modules.setdefault("dnnlib", types.ModuleType("dnnlib"))
    _sys.modules["dnnlib.tflib"] = types.ModuleType("dnnlib.tflib")
    _sys.modules["dnnlib.tflib.network"] = mod
    with open(pkl_path, "wb") as f:
        pickle.dump((net, net, net), f)
    for m in ("dnnlib", "dnnlib.tflib", "dnnlib.tflib.network"):
        _sys.modules.pop(m, None)

    out = tmp_path / "out.npz"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "convert_checkpoint.py"),
         "--src", str(pkl_path), "--out", str(out), "--reference", "/nonexistent"],
        capture_output=True, text=True, env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    with np.load(out) as data:
        assert "mapping.fc0.weight" in data.files
        np.testing.assert_array_equal(data["mapping.w_avg"], tfv["dlatent_avg"])

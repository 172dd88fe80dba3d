"""Eval metrics, plane-chunked generation, video/mesh tooling tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gmpi_tpu.core import geometry as geom_mod
from gmpi_tpu.eval.generate import generate_mpi
from gmpi_tpu.eval.metrics import (
    angle_error,
    cosine_similarity,
    fid_from_features,
    kid_from_features,
    normalized_depth_error,
)
from gmpi_tpu.viz.mesh import (
    extract_mesh_from_alpha,
    marching_tetrahedra,
    mpi_mesh_volume_bounds,
    save_ply,
)
from tests.test_models import tiny_gen_cfg, tiny_geometry


# ---------------------------------------------------------------------------
# Metric math
# ---------------------------------------------------------------------------


def test_fid_identical_distributions_is_zero():
    rng = np.random.default_rng(0)
    f = rng.standard_normal((500, 16))
    assert abs(fid_from_features(f, f.copy())) < 1e-6


def test_fid_shifted_distributions():
    rng = np.random.default_rng(0)
    f1 = rng.standard_normal((2000, 8))
    f2 = rng.standard_normal((2000, 8)) + 2.0
    fid = fid_from_features(f1, f2)
    # mean shift of 2 in 8 dims -> ||mu diff||^2 ~ 32 dominates
    assert 25 < fid < 40


def test_kid_near_zero_for_same_distribution():
    rng = np.random.default_rng(1)
    f = rng.standard_normal((600, 8))
    # unbiased MMD^2: expectation 0 for identical distributions, nonzero
    # variance on finite subsets
    mean, _ = kid_from_features(f, f.copy(), subset_size=100, n_subsets=20)
    assert abs(mean) < 0.05


def test_kid_positive_for_shifted():
    rng = np.random.default_rng(1)
    f1 = rng.standard_normal((600, 8))
    f2 = rng.standard_normal((600, 8)) + 1.0
    mean, _ = kid_from_features(f1, f2, subset_size=100, n_subsets=10)
    assert mean > 0.1


def test_depth_and_angle_errors():
    rng = np.random.default_rng(2)
    d = rng.uniform(0.5, 1.5, (16, 16))
    mask = np.ones((16, 16))
    assert normalized_depth_error(d, d * 2.0 + 3.0, mask) < 1e-10  # affine-invariant
    assert normalized_depth_error(d, rng.uniform(0.5, 1.5, (16, 16)), mask) > 0.1
    assert angle_error(np.array([0.1, 0.2]), np.array([0.1, -0.2, 0.0])) < 1e-12
    assert cosine_similarity(np.ones(4), np.ones(4)) == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Plane-chunked generation == unchunked
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_generate_mpi_chunked_matches_full():
    cfg = tiny_gen_cfg(res=16, alpha_res=16)
    params, buffers = cfg.init(jax.random.key(0))
    geom = tiny_geometry(n_planes=8)
    xyz = geom_mod.multi_res_xyz(geom, 16)
    z = jax.random.normal(jax.random.key(1), (2, cfg.z_dim))

    full = generate_mpi(cfg, params, buffers, z, xyz, 8, chunk_n_planes=-1, noise_mode="const")
    chunked = generate_mpi(cfg, params, buffers, z, xyz, 8, chunk_n_planes=3, noise_mode="const")
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Mesh
# ---------------------------------------------------------------------------


def test_marching_tetrahedra_sphere():
    n = 24
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    center = (n - 1) / 2.0
    r = np.sqrt(((g - center) ** 2).sum(axis=0))
    vol = (r < 7.0).astype(np.float32)
    verts, faces = marching_tetrahedra(vol, 0.5)
    assert len(verts) > 100 and len(faces) > 100
    # all surface vertices near radius 7 of the center
    d = np.linalg.norm(verts - center, axis=1)
    assert np.all(np.abs(d - 7.0) < 1.5)


def test_extract_mesh_and_ply(tmp_path):
    n = 16
    alpha = np.zeros((n, n, n), np.float32)
    alpha[6:10, 6:10, 6:10] = 1.0
    vmin = np.array([-1.0, -1.0, 0.5])
    vmax = np.array([1.0, 1.0, 2.5])
    verts, faces = extract_mesh_from_alpha(alpha, vmin, vmax, iso=0.1)
    assert len(verts) > 0
    assert verts.min() >= vmin.min() - 1e-5 and verts.max() <= vmax.max() + 1e-5
    ply = tmp_path / "mesh.ply"
    save_ply(str(ply), verts, faces)
    data = ply.read_bytes()
    assert data.startswith(b"ply") and len(data) > 100


def test_volume_bounds():
    geom = tiny_geometry(n_planes=6)
    vmin, vmax, ratio = mpi_mesh_volume_bounds(np.asarray(geom.dhw), 0.95, 1.12)
    assert (vmax > vmin).all()
    # cube: equal extents
    ext = vmax - vmin
    np.testing.assert_allclose(ext[0], ext[2], rtol=1e-6)
    assert 0 < ratio <= 1.0


# ---------------------------------------------------------------------------
# InceptionV3 feature extractor (structure; numerics need pretrained weights)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_inception_pool3_shapes():
    from gmpi_tpu.eval.inception import inception_pool3, make_feature_fn, random_params

    params = random_params(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 3, 64, 64)).astype(np.float32))
    feats = inception_pool3(params, x)
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()

    fn = make_feature_fn(params, batch=1)
    out = fn(np.random.default_rng(1).random((3, 3, 32, 32)).astype(np.float32))
    assert out.shape == (3, 2048)


def test_inception_state_dict_converter():
    from gmpi_tpu.eval.inception import convert_torch_state_dict

    sd = {
        "Conv2d_1a_3x3.conv.weight": np.zeros((32, 3, 3, 3), np.float32),
        "Conv2d_1a_3x3.bn.weight": np.ones(32, np.float32),
        "Conv2d_1a_3x3.bn.num_batches_tracked": np.zeros(()),
        "fc.weight": np.zeros((1000, 2048)),
    }
    tree = convert_torch_state_dict(sd)
    assert tree["Conv2d_1a_3x3"]["conv"]["weight"].shape == (32, 3, 3, 3)
    assert "num_batches_tracked" not in tree["Conv2d_1a_3x3"]["bn"]
    assert "fc" not in tree


def test_sanity_full_alpha_mode():
    """stylegan2_sanity_check: with all alphas forced to 1, the render equals
    the nearest plane's RGB (over-compositing collapses at the first plane)."""
    from gmpi_tpu.config import ExperimentConfig, ModelPreset, PlaneConfig, StepHparams, TrainHparams
    from gmpi_tpu.core.poses import SphereCameraConfig
    from gmpi_tpu.eval.harness import FakeImageGenerator

    cfg = ExperimentConfig(
        name="t", resolution=16, fov_deg=12.6,
        camera=SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        planes=PlaneConfig(n_planes=4, min_d=0.95, max_d=1.12),
        hparams=StepHparams(2, 16, 16, 1, 2e-3, 2e-3),
        train=TrainHparams(z_dim=32, w_dim=32),
        model=ModelPreset(channel_base=512, channel_max=32, num_bf16_res=0,
                          conv_clamp=None, gen_alpha_largest_res=16, mbstd_group_size=1),
    )
    import jax as _jax

    params, buffers = cfg.generator_cfg().init(_jax.random.key(0))
    gen = FakeImageGenerator(cfg, params, buffers, n_planes=4, img_size=16,
                             sanity_full_alpha=True)
    mpi = gen.sample_mpi(seed=0)
    np.testing.assert_array_equal(np.asarray(mpi[:, :, 3]), 1.0)


def test_render_video_artifacts_end_to_end(tmp_path):
    """Full viz pipeline on a tiny generator: frames, sheets, video/frames."""
    import dataclasses

    from gmpi_tpu.config import ExperimentConfig, ModelPreset, PlaneConfig, StepHparams, TrainHparams
    from gmpi_tpu.core.poses import SphereCameraConfig
    from gmpi_tpu.viz.render_video import render_camera_path, save_mpi_sheets, save_video

    cfg = ExperimentConfig(
        name="t", resolution=16, fov_deg=12.6,
        camera=SphereCameraConfig(1.0, 1.0, 0.0, 0.289, 0.0, 0.127),
        planes=PlaneConfig(n_planes=4, min_d=0.95, max_d=1.12),
        hparams=StepHparams(2, 16, 16, 1, 2e-3, 2e-3),
        train=TrainHparams(z_dim=32, w_dim=32),
        model=ModelPreset(channel_base=512, channel_max=32, num_bf16_res=0,
                          conv_clamp=None, gen_alpha_largest_res=16, mbstd_group_size=1),
    )
    import jax as _jax

    params, buffers = cfg.generator_cfg().init(_jax.random.key(0))
    frames, depths, mpi = render_camera_path(
        cfg, params, buffers, seed=0, n_frames=3, n_planes=4, img_size=16,
        chunk_n_planes=2, render_plane_chunk=2,
    )
    assert frames.shape == (3, 16, 16, 3) and frames.dtype == np.uint8
    assert depths.shape == (3, 16, 16)
    assert mpi.shape == (4, 4, 16, 16)

    save_mpi_sheets(str(tmp_path), mpi)
    assert (tmp_path / "mpi_rgb.png").exists()
    assert (tmp_path / "mpi_alpha.png").exists()
    out = save_video(str(tmp_path / "rgb.mp4"), frames, fps=5)
    assert os.path.exists(out)


@pytest.mark.skipif("GMPI_INCEPTION_PTH" not in __import__("os").environ,
                    reason="set GMPI_INCEPTION_PTH to a torchvision FID "
                           "InceptionV3 .pth to run the real-weights parity")
def test_inception_real_weights_parity():
    """Weights-available fallback (docs/COVERAGE.md 'validation status'):
    if a real Inception checkpoint exists, the JAX pool3 features must match
    the torch forward on the same inputs."""
    import os

    import torch

    from gmpi_tpu.eval.inception import inception_pool3, load_params

    path = os.environ["GMPI_INCEPTION_PTH"]
    params = load_params(path)
    x = np.random.default_rng(0).random((2, 3, 299, 299)).astype(np.float32)
    got = np.asarray(inception_pool3(params, jnp.asarray(x)))

    from torchvision.models import inception_v3

    net = inception_v3(weights=None, aux_logits=True, init_weights=False)
    net.load_state_dict(torch.load(path, map_location="cpu"), strict=False)
    net.eval()
    feats = []

    def hook(_m, _i, o):
        feats.append(o.flatten(1).detach().numpy())

    net.avgpool.register_forward_hook(hook)
    with torch.no_grad():
        net(torch.from_numpy(x) * 2 - 1)  # torchvision normalizes internally
    np.testing.assert_allclose(got, feats[0], rtol=1e-3, atol=1e-3)


def test_frechet_distance_pinned_to_reference_fid_score():
    """VERDICT r3 #5: our FID math vs the reference's vendored
    ``pytorch_fid.fid_score.calculate_frechet_distance`` (the in-training FID
    oracle, ``gmpi/utils/pytorch_fid/fid_score.py:155-205``) — normal branch
    AND the eps-offset branch (non-finite sqrtm of a nilpotent product)."""
    import contextlib
    import io

    from tests._reference import import_reference, reference_available
    if not reference_available():
        pytest.skip("reference repo not mounted")
    fs = import_reference("gmpi.utils.pytorch_fid.fid_score")
    from gmpi_tpu.eval.metrics import feature_statistics, frechet_distance

    rng = np.random.default_rng(3)
    a = rng.standard_normal((64, 16))
    b = rng.standard_normal((64, 16)) * 1.3 + 0.2
    mu1, s1 = feature_statistics(a)
    mu2, s2 = feature_statistics(b)
    want = fs.calculate_frechet_distance(mu1, s1, mu2, s2)
    got = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-12)

    # eps-offset branch: sigma1 @ sigma2 nilpotent -> sqrtm non-finite in
    # both implementations -> both retry with the eps-regularized product
    s1n = np.array([[1.0, 0.0], [0.0, 0.0]])
    s2n = np.array([[0.0, 1.0], [0.0, 0.0]])
    mu1n = np.array([0.5, -0.25])
    mu2n = np.array([0.1, 0.3])
    with contextlib.redirect_stdout(io.StringIO()):  # ref print()s a warning
        want_eps = fs.calculate_frechet_distance(mu1n, s1n, mu2n, s2n)
    got_eps = frechet_distance(mu1n, s1n, mu2n, s2n)
    assert np.isfinite(got_eps)
    np.testing.assert_allclose(got_eps, want_eps, rtol=1e-12)


def test_kid_mmd2_hand_fixture():
    """KID's unbiased MMD^2 against a from-scratch O(n^2) recomputation of
    the torch_fidelity formula (poly kernel (x.y/d + 1)^3, unbiased
    diagonal-excluded sums) on a tiny fixture."""
    from gmpi_tpu.eval.metrics import kid_from_features

    rng = np.random.default_rng(11)
    x = rng.standard_normal((6, 4))
    y = rng.standard_normal((6, 4)) + 0.5

    d = x.shape[1]
    k = lambda u, v: (u @ v / d + 1.0) ** 3
    m = x.shape[0]
    sxx = sum(k(x[i], x[j]) for i in range(m) for j in range(m) if i != j) / (m * (m - 1))
    syy = sum(k(y[i], y[j]) for i in range(m) for j in range(m) if i != j) / (m * (m - 1))
    sxy = sum(k(x[i], y[j]) for i in range(m) for j in range(m)) / (m * m)
    want = sxx + syy - 2 * sxy

    # subset_size >= n and n_subsets=1 -> exactly one full-set MMD^2
    got, _ = kid_from_features(x, y, subset_size=6, n_subsets=1, seed=0)
    np.testing.assert_allclose(got, want, rtol=1e-10)

"""End-to-end eval-chain integration test (``gmpi/eval/eval.sh:64-172``
analogue): prepare_real -> prepare_fake -> fid_kid -> consistency ->
geometry, driven through ``eval_gmpi.run_all`` with in-process stub
adapters standing in for ArcFace / MTCNN / Deep3DFace."""

import json
import os
import sys
import types

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import eval_gmpi
from gmpi_tpu.train.checkpoint import save_checkpoint
from gmpi_tpu.train.step import init_train_state
from tests.test_train import tiny_config


class StubEmbedder:
    """Deterministic stand-in for the ArcFace adapter."""

    def embed(self, img):
        x = np.asarray(img, np.float32)
        return np.array([x.mean(), x.std(), x[..., 0].mean(), x[..., 1].mean()])


class StubDetector:
    def detect(self, img):
        h, w = img.shape[:2]
        return np.array(
            [[w * 0.3, h * 0.4], [w * 0.7, h * 0.4], [w * 0.5, h * 0.55],
             [w * 0.35, h * 0.7], [w * 0.65, h * 0.7]], np.float32)


class StubEstimator:
    def estimate(self, img, landmarks):
        h, w = img.shape[:2]
        rng = np.random.default_rng(int(np.asarray(img).sum()) % 1000)
        return {
            "angles": np.array([0.01, -0.02, 0.0], np.float32),
            "depth": rng.uniform(0.9, 1.2, (h, w)).astype(np.float32),
            "mask": np.ones((h, w), bool),
        }


class StubDataset:
    """Minimal dataset yielding (img_chw in [-1,1], pose, ...)."""

    def __init__(self, n=4, size=16):
        self.n, self.size = n, size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return (rng.uniform(-1, 1, (3, self.size, self.size)).astype(np.float32),
                np.zeros(16, np.float32), 0, 0.0, 0.0)


def test_eval_all_chain_with_stub_adapters(tmp_path, monkeypatch):
    cfg = tiny_config()
    state = init_train_state(cfg, jax.random.key(0))
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state)

    import gmpi_tpu.config as config_mod
    import gmpi_tpu.data as data_mod

    monkeypatch.setattr(config_mod, "get_config", lambda name: cfg)
    monkeypatch.setattr(data_mod, "get_dataset", lambda *a, **k: StubDataset())

    # random inception weights exercise the real FID path structurally
    import gmpi_tpu.eval.inception as inc

    monkeypatch.setattr(inc, "load_params",
                        lambda path: inc.random_params(jax.random.key(0)))

    out = str(tmp_path / "eval")
    args = types.SimpleNamespace(
        task="all", dataset="TINY", ckpt=ckpt_dir, use_ema=True, out=out,
        n_imgs=3, n_planes=cfg.planes.n_planes, img_size=16, chunk_n_planes=-1,
        truncation_psi=1.0, stylegan2_sanity_check=False,
        data_root="stub", pose_root=None, real_dir=None, fake_dir=None,
        inception_weights="random",
        embedder="tests.test_eval_chain:StubEmbedder", embedder_module=None,
        landmark_detector="tests.test_eval_chain:StubDetector",
        pose_estimator="tests.test_eval_chain:StubEstimator",
        n_consistency=2, n_geometry=2,
    )
    eval_gmpi.run_all(args)

    results = json.load(open(os.path.join(out, "eval_all.json")))
    assert "fid_kid" in results and np.isfinite(results["fid_kid"]["frechet_inception_distance"])
    assert "consistency" in results
    assert -1.0 <= results["consistency"]["consistency_mean"] <= 1.0
    assert "geometry" in results
    assert results["geometry"]["n_evaluated"] == 2
    assert "angle_error_mse" in results["geometry"]
    assert "depth_error_mse" in results["geometry"]
    # artifacts on disk
    assert os.path.isdir(os.path.join(out, "real"))
    assert os.path.isdir(os.path.join(out, "fake", "rgb"))
    assert os.path.isdir(os.path.join(out, "geometry", "depth"))

    # determinism: the whole chain re-run under the same seeds reproduces
    # the FID/KID (and consistency/geometry) numbers EXACTLY — per-image
    # seeds are the reference's reproducibility contract
    # (``gmpi/eval/prepare_fake_data.py:204``), so any nondeterminism in
    # generation, rendering, or the metric math shows up here
    out2 = str(tmp_path / "eval2")
    args2 = types.SimpleNamespace(**{**vars(args), "out": out2})
    eval_gmpi.run_all(args2)
    results2 = json.load(open(os.path.join(out2, "eval_all.json")))
    assert (results2["fid_kid"]["frechet_inception_distance"]
            == results["fid_kid"]["frechet_inception_distance"])
    assert (results2["fid_kid"]["kernel_inception_distance_mean"]
            == results["fid_kid"]["kernel_inception_distance_mean"])
    assert (results2["consistency"]["consistency_mean"]
            == results["consistency"]["consistency_mean"])
    assert (results2["geometry"]["depth_error_mse"]
            == results["geometry"]["depth_error_mse"])

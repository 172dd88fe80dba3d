"""End-to-end training driver test: short run on synthetic data with
snapshots, checkpoints, metric log, and resume."""

import json
import os

import numpy as np
import pytest

import jax

from gmpi_tpu.train.checkpoint import (
    export_torch_style,
    load_checkpoint,
    load_torch_style,
    save_checkpoint,
)
from gmpi_tpu.train.loop import train
from gmpi_tpu.train.step import init_train_state
from tests.test_train import tiny_config


def synthetic_batches(n, batch=4, size=16, seed=0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        yield (
            rng.uniform(-1, 1, (batch, 3, size, size)).astype(np.float32),
            rng.standard_normal((batch, 16)).astype(np.float32),
        )


@pytest.mark.slow
def test_train_loop_end_to_end(tmp_path):
    cfg = tiny_config()
    out = str(tmp_path / "run")
    state = train(
        cfg,
        synthetic_batches(8),
        out,
        total_iters=8,
        sample_interval=4,
        model_save_interval=4,
        seed=0,
    )
    assert int(np.asarray(state.step)) == 8
    # config snapshot + metrics + snaps + checkpoints all exist
    assert os.path.exists(os.path.join(out, "config.json"))
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert lines and "d_loss" in lines[0]
    assert any(f.startswith("snap_") for f in os.listdir(os.path.join(out, "snaps")))
    assert os.path.exists(os.path.join(out, "checkpoints", "latest"))

    # resume continues from saved step
    state2 = train(
        cfg,
        synthetic_batches(4, seed=1),
        out,
        total_iters=10,
        sample_interval=100,
        model_save_interval=100,
        seed=0,
    )
    assert int(np.asarray(state2.step)) == 10


@pytest.mark.slow
def test_train_loop_fid_and_rich_snapshots(tmp_path):
    """In-training FID wiring (``gmpi/train.py:1009-1071``) and the
    fixed/tilted/random EMA+raw grids with MPI sheets (``:815-994``)."""
    cfg = tiny_config()
    out = str(tmp_path / "run")

    def stub_features(images):
        flat = images.reshape(len(images), -1)
        return np.stack([flat.mean(1), flat.std(1)], axis=1)

    rng = np.random.default_rng(0)
    reals = rng.uniform(-1, 1, (8, 3, 16, 16)).astype(np.float32)
    state = train(
        cfg,
        synthetic_batches(5),
        out,
        total_iters=5,
        sample_interval=2,
        model_save_interval=100,
        eval_freq=2,
        fid_feature_fn=stub_features,
        fid_real_images=reals,
        seed=0,
    )
    assert int(np.asarray(state.step)) == 5
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert any("fid" in l for l in lines)
    snaps = os.listdir(os.path.join(out, "snaps"))
    for pat in ("_ema.png", "_raw.png", "_rgb.png", "_alpha.png"):
        assert any(f.endswith(pat) for f in snaps), (pat, snaps)


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    state = init_train_state(cfg, jax.random.key(0))
    path = save_checkpoint(str(tmp_path), state)
    assert os.path.isdir(path)
    template = init_train_state(cfg, jax.random.key(1))
    restored = load_checkpoint(str(tmp_path), template)
    a = jax.tree_util.tree_leaves(state.params_g)
    b = jax.tree_util.tree_leaves(restored.params_g)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_torch_style_export_roundtrip(tmp_path):
    cfg = tiny_config()
    state = init_train_state(cfg, jax.random.key(0))
    path = str(tmp_path / "g.npz")
    export_torch_style(path, state.params_g, state.buffers_g)
    params, buffers = load_torch_style(path)
    np.testing.assert_array_equal(
        np.asarray(params["mapping"]["fc0"]["weight"]),
        np.asarray(state.params_g["mapping"]["fc0"]["weight"]),
    )
    assert "w_avg" in buffers["mapping"]

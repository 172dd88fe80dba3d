"""Real-data ingestion rehearsal (VERDICT r3 #9): a 16-image FFHQ-format
zip + per-image ``.mat`` pose fixture flows through the *actual CLI entry
point* ``train_gmpi.main`` — config preset, dataset construction, pose
conversion, ShardedLoader, jitted train step, metrics, checkpoint — closing
the gap between "datasets unit-tested" and "training consumed a dataset
end-to-end".  Reference path: ``gmpi/datasets.py:24-149`` feeding
``gmpi/train.py:360-460``.
"""

import json
import os
import sys
import zipfile

import numpy as np
import pytest
from PIL import Image

from tests.test_train import tiny_config


@pytest.fixture
def ffhq16_fixture(tmp_path):
    import io

    import scipy.io as sio

    rng = np.random.default_rng(42)
    zpath = tmp_path / "ffhq16x16.zip"
    pose_dir = tmp_path / "coeffs"
    pose_dir.mkdir()
    with zipfile.ZipFile(zpath, "w") as zf:
        for i in range(16):
            arr = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            zf.writestr(f"{i:05d}.png", buf.getvalue())
            sio.savemat(pose_dir / f"{i:05d}.mat", {
                "angle": (rng.standard_normal((1, 3)) * 0.2).astype(np.float32),
                "trans": (rng.standard_normal((1, 3)) * 0.1).astype(np.float32),
            })
    (pose_dir / "fail_list.txt").write_text("00007.png\n")
    return str(zpath), str(pose_dir)


@pytest.mark.slow
def test_train_gmpi_cli_ingests_ffhq_fixture(ffhq16_fixture, tmp_path, monkeypatch):
    zpath, pose_dir = ffhq16_fixture
    out_dir = str(tmp_path / "run")

    import train_gmpi
    from gmpi_tpu import config as config_mod

    # a 16^2 preset so the CLI path runs in seconds on CPU; everything else
    # (dataset class selection, loader sharding, train loop) is production
    monkeypatch.setitem(config_mod.PRESETS, "FFHQTINY", tiny_config())
    monkeypatch.setattr(sys, "argv", [
        "train_gmpi.py",
        "--dataset", "FFHQTINY",
        "--data_root", zpath,
        "--pose_root", pose_dir,
        "--output_dir", out_dir,
        "--total_iters", "2",
        "--no_resume",
    ])
    train_gmpi.main()

    # config snapshot, per-step metrics, and a resumable checkpoint exist
    assert os.path.exists(os.path.join(out_dir, "config.json"))
    lines = [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]
    assert lines, "no metrics logged"
    assert np.isfinite(lines[0]["d_loss"]) and np.isfinite(lines[0]["g_loss"])
    assert os.path.exists(os.path.join(out_dir, "checkpoints", "latest"))

    # the loader really consumed the zip: 15 usable images (one fail-listed)
    from gmpi_tpu.data import get_dataset

    ds = get_dataset(
        "FFHQ", dataset_path=zpath, raw_img_size=16, img_size=16,
        pose_data_path=pose_dir, sphere_center=1.0, sphere_r=1.0,
        flat_pose_dim=16,
    )
    assert len(ds) == 15

"""Step-keyed curriculum machinery (``gmpi/curriculums.py:50-85``)."""

import pytest
from gmpi_tpu.curriculum import Curriculum, from_reference_style


def test_at_step_merging():
    cur = from_reference_style({
        0: {"batch_size": 8, "img_size": 64},
        1000: {"batch_size": 4, "img_size": 128},
        "lr": 0.002,
        "r1_lambda": 10.0,
    })
    m0 = cur.at_step(0)
    assert m0["batch_size"] == 8 and m0["lr"] == 0.002
    m1 = cur.at_step(999)
    assert m1["img_size"] == 64
    m2 = cur.at_step(1000)
    assert m2["img_size"] == 128 and m2["r1_lambda"] == 10.0


def test_upsample_boundaries():
    cur = Curriculum(schedule={0: {}, 500: {}, 2000: {}})
    assert cur.next_upsample_step(0) == 500
    assert cur.next_upsample_step(600) == 2000
    assert cur.next_upsample_step(3000) == float("inf")
    assert cur.last_upsample_step(600) == 500
    assert cur.stage_boundaries() == [0, 500, 2000]


@pytest.mark.slow
def test_curriculum_drives_train_loop(tmp_path):
    """2-stage toy schedule: the driver rebuilds its jitted step and data
    iterator at the boundary (batch size 4 -> 2, lr drop)."""
    import numpy as np

    from gmpi_tpu.curriculum import apply_to_config
    from gmpi_tpu.train.loop import train
    from tests.test_train import tiny_config

    cfg = tiny_config()
    cur = Curriculum(schedule={0: {"batch_size": 4, "gen_lr": 2e-3},
                               3: {"batch_size": 2, "gen_lr": 1e-3}})

    sizes = []

    def make_batches(entry):
        def gen():
            rng = np.random.default_rng(0)
            while True:
                sizes.append(entry["batch_size"])
                yield (rng.uniform(-1, 1, (entry["batch_size"], 3, 16, 16)).astype(np.float32),
                       rng.standard_normal((entry["batch_size"], 16)).astype(np.float32))
        return gen()

    state = train(
        cfg, make_batches(cur.at_step(0)), str(tmp_path / "run"),
        total_iters=5, sample_interval=100, model_save_interval=100,
        curriculum=cur, rebuild_batches=make_batches, seed=0,
    )
    assert int(np.asarray(state.step)) == 5
    # stage 2 batches (size 2) were actually consumed
    assert 2 in sizes and 4 in sizes
    # config mapping applies hyperparameters
    cfg2 = apply_to_config(cfg, cur.at_step(4))
    assert cfg2.hparams.batch_size == 2 and cfg2.hparams.gen_lr == 1e-3

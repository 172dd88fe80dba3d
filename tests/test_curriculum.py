"""Step-keyed curriculum machinery (``gmpi/curriculums.py:50-85``)."""

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

"""TensorBoard event-writer parity tests.

The reference logs scalars through ``torch.utils.tensorboard``
(``/root/reference/gmpi/utils/tensorboard_utils.py:6-32``); our writer
hand-encodes the same Event protos + TFRecord framing with zero
dependencies.  When the real ``tensorboard`` package is importable we
cross-validate the emitted file byte-for-byte against its proto classes
and record loader (CRC checks included); otherwise the round-trip runs
through our own reader.
"""

import pytest

from gmpi_tpu.utils.tb_writer import (
    SummaryWriter, crc32c, encode_scalar_event, read_events)

try:
    from tensorboard.backend.event_processing.event_file_loader import (
        RawEventFileLoader)
    from tensorboard.compat.proto.event_pb2 import Event

    HAVE_TB = True
except Exception:  # pragma: no cover
    HAVE_TB = False


def test_crc32c_vectors():
    # RFC 3720 / kernel test vectors for Castagnoli CRC
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_roundtrip_own_reader(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalars_dict({"loss_g": 1.25, "loss_d": -0.5}, 10)
    w.add_scalar("fid", 42.0, 20)
    w.close()
    evs = read_events(w.path)  # verifies framing CRCs
    assert evs == [(10, {"loss_g": 1.25, "loss_d": -0.5}), (20, {"fid": 42.0})]


@pytest.mark.skipif(not HAVE_TB, reason="tensorboard not installed")
def test_event_bytes_match_real_proto():
    mine = encode_scalar_event(10, 123.5, {"loss_g": 1.25})
    e = Event()
    e.wall_time = 123.5
    e.step = 10
    v = e.summary.value.add()
    v.tag = "loss_g"
    v.simple_value = 1.25
    assert mine == e.SerializeToString()


@pytest.mark.skipif(not HAVE_TB, reason="tensorboard not installed")
def test_file_loads_in_tensorboard(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalars_dict({"loss_g": 1.25}, 7)
    w.close()
    records = list(RawEventFileLoader(w.path).Load())  # validates CRCs
    assert len(records) == 2
    head = Event()
    head.ParseFromString(records[0])
    assert head.file_version == "brain.Event:2"
    ev = Event()
    ev.ParseFromString(records[1])
    assert ev.step == 7
    assert ev.summary.value[0].tag == "loss_g"
    assert ev.summary.value[0].simple_value == 1.25


def test_metric_logger_writes_events(tmp_path):
    from gmpi_tpu.train.loop import MetricLogger

    lg = MetricLogger(str(tmp_path))
    lg.log(3, {"loss": 0.5})
    lg.close()
    import glob

    files = glob.glob(str(tmp_path / "tensorboard" / "events.out.tfevents.*"))
    assert len(files) == 1
    assert read_events(files[0]) == [(3, {"loss": 0.5})]

"""TensorBoard scalar event writer (pure stdlib TFRecord + Event proto).

Reference parity surface: reference trainer.py:151 configures
tensorboard_logger into the run logdir; our MetricsLog writes real scalar
events there. Golden vectors below pin the wire format against the
published TFRecord/crc32c spec so a regression can't silently produce
files TensorBoard rejects.
"""

import glob
import os
import struct

from fancyrec_tpu.utils.tb_events import (
    TBEventWriter, _masked_crc, crc32c, read_events)


def test_crc32c_known_vectors():
    # published Castagnoli CRC test vectors (rfc3720 appendix B.4 style)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_masked_crc_matches_tfrecord_spec():
    # masked_crc = rotr15(crc) + 0xa282ead8 (TFRecord framing constant)
    data = b"123456789"
    crc = 0xE3069283
    expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert _masked_crc(data) == expect


def test_write_read_roundtrip(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(0, {"loss": 1.5, "auc": 0.25})
    w.add_scalars(1, {"loss": 0.75, "skipme": None, "name": "x"})
    w.close()
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    recs = read_events(files[0])    # verifies every frame's CRCs
    assert recs[0][0] == 0
    assert abs(recs[0][1]["loss"] - 1.5) < 1e-6
    assert abs(recs[0][1]["auc"] - 0.25) < 1e-6
    assert recs[1][0] == 1
    assert set(recs[1][1]) == {"loss"}   # non-numeric keys dropped


def test_file_has_version_header(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(3, {"x": 1.0})
    w.close()
    with open(w.path, "rb") as f:
        data = f.read()
    (length,) = struct.unpack_from("<Q", data, 0)
    payload = data[12: 12 + length]
    # first record is the Event.file_version = "brain.Event:2" header
    assert b"brain.Event:2" in payload


def test_no_file_until_first_scalar(tmp_path):
    d = str(tmp_path / "lazy")
    w = TBEventWriter(d)
    assert not os.path.exists(d)          # lazy: nothing written yet
    w.add_scalars(0, {"only_strings": "x"})
    assert not os.path.exists(d)          # no numeric values -> still lazy
    w.add_scalars(0, {"v": 2.0})
    assert os.path.exists(w.path)
    w.close()


def test_metricslog_writes_both(tmp_path):
    from fancyrec_tpu.train.trainer import MetricsLog

    mlog = MetricsLog(str(tmp_path))
    mlog.write({"epoch": 0, "score": 512.5, "lr": 1e-4, "note": "hi"})
    mlog.write({"epoch": 1, "score": 523.0, "lr": 9.9e-5})
    assert os.path.exists(mlog.path)
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    recs = read_events(files[0])
    assert [r[0] for r in recs] == [0, 1]
    assert abs(recs[1][1]["score"] - 523.0) < 1e-3


def test_real_tensorboard_loader_reads_our_files(tmp_path):
    """Cross-validate against TensorBoard's own event loader (installed
    here): steps, tags, and values must round-trip. The loader migrates
    simple_value into the tensor form (data_compat), so read float_val."""
    try:
        from tensorboard.backend.event_processing.event_file_loader import (
            EventFileLoader)
    except Exception:  # pragma: no cover - env without tensorboard
        import pytest
        pytest.skip("tensorboard not importable")

    w = TBEventWriter(str(tmp_path))
    w.add_scalars(0, {"loss": 1.5, "auc": 0.25})
    w.add_scalars(7, {"loss": 0.75})
    w.close()
    events = list(EventFileLoader(w.path).Load())
    assert events[0].file_version == "brain.Event:2"
    got = {}
    for e in events[1:]:
        for v in e.summary.value:
            val = (v.tensor.float_val[0] if v.tensor.float_val
                   else v.simple_value)
            got[(e.step, v.tag)] = val
    assert abs(got[(0, "loss")] - 1.5) < 1e-6
    assert abs(got[(0, "auc")] - 0.25) < 1e-6
    assert abs(got[(7, "loss")] - 0.75) < 1e-6


def test_roundtrip_large_summary_multibyte_varint(tmp_path):
    """>127-byte summaries take a 2-byte length varint; regression for the
    reader's missing shift increment (real epoch records carry ~12 tags)."""
    w = TBEventWriter(str(tmp_path))
    scalars = {"metric_%02d" % i: float(i) for i in range(20)}
    w.add_scalars(5, scalars)
    w.close()
    recs = read_events(w.path)
    assert recs[0][0] == 5
    assert len(recs[0][1]) == 20
    assert abs(recs[0][1]["metric_13"] - 13.0) < 1e-6

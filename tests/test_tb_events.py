"""Native TensorBoard event writer — format-level and round-trip tests.

The writer replaces the reference's torch-delegated event logging
(reference: hilo_mpc/plugins/tensorboard/wrapper.py, pytorch/wrapper.py
tensorboard hooks). Round-trip verification uses the *official*
tensorboard event loader when installed, so the bytes we emit are
checked against the real consumer, not our own parser.
"""
import os
import struct

import numpy as np
import pytest

from hilo_mpc_tpu.utils.tb_events import (EventFileWriter,
                                          TensorBoardSupervisor, crc32c,
                                          masked_crc)


def test_crc32c_known_vectors():
    # RFC 3720 B.4 test vectors for CRC32C (Castagnoli)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0x0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_masked_crc_is_invertible_shape():
    c = masked_crc(b"payload")
    assert 0 <= c <= 0xFFFFFFFF


def test_event_file_record_framing(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.add_scalar("loss/train", 0.5, step=0)
    w.add_scalar("loss/train", 0.25, step=1)
    w.close()
    raw = open(w.path, "rb").read()
    # walk the TFRecord framing and verify both CRCs of every record
    off, n = 0, 0
    while off < len(raw):
        header = raw[off:off + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", raw[off + 8:off + 12])
        assert hcrc == masked_crc(header)
        payload = raw[off + 12:off + 12 + length]
        (pcrc,) = struct.unpack("<I",
                                raw[off + 12 + length:off + 16 + length])
        assert pcrc == masked_crc(payload)
        off += 16 + length
        n += 1
    assert off == len(raw)
    assert n == 3  # file_version event + 2 scalars


def _scalar_of(value):
    # TB >= 2.x event loaders migrate simple_value -> rank-0 tensor proto;
    # accept either representation
    if value.HasField("tensor"):
        return value.tensor.float_val[0]
    return value.simple_value


def test_roundtrip_with_official_loader(tmp_path):
    loader_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")
    w = EventFileWriter(str(tmp_path))
    vals = [(0, 1.5), (1, 0.75), (2, 0.1)]
    for s, v in vals:
        w.add_scalar("loss/val", v, step=s)
    w.close()
    events = list(loader_mod.EventFileLoader(w.path).Load())
    assert events[0].file_version == "brain.Event:2"
    scalars = [e for e in events if e.summary.value]
    assert len(scalars) == 3
    for e, (s, v) in zip(scalars, vals):
        assert e.step == s
        assert e.summary.value[0].tag == "loss/val"
        np.testing.assert_allclose(_scalar_of(e.summary.value[0]), v,
                                   rtol=1e-6)
        assert e.wall_time > 1e9  # a real unix timestamp


def test_negative_step_and_closed_writer(tmp_path):
    w = EventFileWriter(str(tmp_path))
    w.add_scalar("t", -3.0, step=-1)  # int64 negative varint path
    w.close()
    with pytest.raises(ValueError):
        w.add_scalar("t", 0.0, step=2)
    loader_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")
    events = [e for e in loader_mod.EventFileLoader(w.path).Load()
              if e.summary.value]
    assert events[0].step == -1
    np.testing.assert_allclose(_scalar_of(events[0].summary.value[0]), -3.0)


def test_ann_train_tensorboard_native(tmp_path):
    # ANN.train(tensorboard=True) writes loadable event files with no torch
    from hilo_mpc_tpu import ANN, Dense

    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (64, 1))
    y = X ** 2
    ann = ANN(["x"], ["y"])
    ann.add_layers(Dense(8, activation="tanh"))
    ann.setup()
    ann.train(X=X, y=y, epochs=3, batch_size=16, verbose=False,
              tensorboard=True, tensorboard_log_dir=str(tmp_path))
    files = [f for f in os.listdir(tmp_path) if "tfevents" in f]
    assert len(files) == 1
    loader_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader")
    path = os.path.join(tmp_path, files[0])
    tags = {v.tag for e in loader_mod.EventFileLoader(path).Load()
            for v in e.summary.value}
    assert tags == {"loss/train", "loss/val"}


def test_supervisor_gate(monkeypatch):
    import shutil as _shutil

    monkeypatch.setattr(_shutil, "which", lambda name: None)
    sup = TensorBoardSupervisor("/tmp/does-not-matter")
    with pytest.raises(RuntimeError, match="tensorboard"):
        sup.start()
    assert not sup.running()
    sup.stop()  # idempotent no-op when never started

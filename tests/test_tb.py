"""TensorBoard scalar export (core/tb.py).

The reference wrote TB summaries every step
(`train_n_est_w_experts.py:205-207, 289-292`); these tests pin that the
rebuilt event files are real TFRecord/Event streams TensorBoard can
read: CRC-32C vectors, record framing, and RunDir.metrics mirroring.
"""

import glob
import os
import struct

import pytest

from nestinet_tpu.core.rundir import RunDir
from nestinet_tpu.core.tb import EventWriter, _crc32c, _masked_crc

pytestmark = pytest.mark.fast


def test_crc32c_vectors():
    # Canonical CRC-32C check value (RFC 3720 / iSCSI test vector).
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0


def _read_events(path):
    """Parse a tfevents file with independent framing checks."""
    from tensorboard.compat.proto.event_pb2 import Event

    events = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header), "header crc mismatch"
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload), "payload crc mismatch"
            ev = Event()
            ev.ParseFromString(payload)
            events.append(ev)
    return events


def test_event_writer_roundtrip(tmp_path):
    logdir = str(tmp_path / "tb")
    w = EventWriter(logdir)
    w.scalar("train/loss", 0.5, 1)
    w.scalar("train/loss", 0.25, 2)
    w.scalars("eval", {"rms_deg": 7.5, "note": "skipped"}, 3)
    w.close()

    files = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert len(files) == 1
    events = _read_events(files[0])
    assert events[0].file_version == "brain.Event:2"
    scalars = [
        (v.tag, e.step, v.simple_value)
        for e in events[1:]
        for v in e.summary.value
    ]
    assert ("train/loss", 1, 0.5) in scalars
    assert ("train/loss", 2, 0.25) in scalars
    assert ("eval/rms_deg", 3, 7.5) in scalars
    # non-numeric values are not exported
    assert not any(t == "eval/note" for t, _, _ in scalars)


def test_rundir_metrics_mirrors_to_tb(tmp_path):
    rd = RunDir(str(tmp_path / "run"))
    rd.metrics(kind="train", epoch=0, step=10, loss=1.5, lr=1e-4)
    rd.metrics(kind="eval", epoch=0, step=10, rms_deg=12.0)
    rd.close()

    files = glob.glob(os.path.join(rd.path, "tb", "events.out.tfevents.*"))
    assert len(files) == 1
    events = _read_events(files[0])
    tags = {
        v.tag: (e.step, v.simple_value)
        for e in events[1:]
        for v in e.summary.value
    }
    assert tags["train/loss"] == (10, 1.5)
    assert tags["eval/rms_deg"] == (10, 12.0)
    assert "train/lr" in tags
    # metrics.jsonl still written alongside
    assert os.path.isfile(os.path.join(rd.path, "metrics.jsonl"))

"""Minimal TensorBoard scalar event writer.

The reference emitted TB scalar summaries every step
(`train_n_est_w_experts.py:171-179, 205-207, 289-292`); this module
restores that artifact next to `metrics.jsonl` without importing the
heavyweight torch/TF summary stacks: events are encoded with
tensorboard's own protobufs (`tensorboard.compat.proto.event_pb2`,
available in this image) and framed as TFRecords with a pure-Python
masked CRC-32C — a few scalar records per epoch, so speed is
irrelevant.  If tensorboard is not importable the writer degrades to a
no-op so training never depends on it.

File format: `events.out.tfevents.<wall_time>.<hostname>` containing
length-prefixed records `[len u64][masked crc32c(len) u32][payload]
[masked crc32c(payload) u32]`, first record a file_version Event —
exactly what `tensorboard --logdir` expects.
"""

from __future__ import annotations

import os
import socket
import struct
import time

try:
    from tensorboard.compat.proto.event_pb2 import Event
    from tensorboard.compat.proto.summary_pb2 import Summary

    _HAVE_TB = True
except Exception:  # pragma: no cover - image always has tensorboard
    _HAVE_TB = False

# ---- CRC-32C (Castagnoli), table-driven, as TFRecord framing requires ----
_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE:
        return _CRC_TABLE
    poly = 0x82F63B78
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    _CRC_TABLE = table
    return table


def _crc32c(data: bytes) -> int:
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


class EventWriter:
    """Append-only TB scalar writer for one log directory."""

    def __init__(self, logdir: str):
        self._file = None
        if not _HAVE_TB:
            return
        os.makedirs(logdir, exist_ok=True)
        name = f"events.out.tfevents.{int(time.time())}.{socket.gethostname()}"
        self._file = open(os.path.join(logdir, name), "ab")
        first = Event(wall_time=time.time(), file_version="brain.Event:2")
        self._write_record(first.SerializeToString())

    def _write_record(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._file.write(header)
        self._file.write(struct.pack("<I", _masked_crc(header)))
        self._file.write(payload)
        self._file.write(struct.pack("<I", _masked_crc(payload)))
        self._file.flush()

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._file is None:
            return
        ev = Event(
            wall_time=time.time(),
            step=int(step),
            summary=Summary(
                value=[Summary.Value(tag=tag, simple_value=float(value))]
            ),
        )
        self._write_record(ev.SerializeToString())

    def scalars(self, prefix: str, values: dict, step: int) -> None:
        for k, v in values.items():
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                self.scalar(f"{prefix}/{k}" if prefix else k, v, step)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None

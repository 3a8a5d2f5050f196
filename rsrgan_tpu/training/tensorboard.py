"""Minimal TensorBoard event-file writer (no TensorFlow import).

The reference logs every loss term through ``tf.summary.FileWriter`` into
``save_dir/train`` and ``save_dir/eval`` (models/gan_rnn_placeholder.py:81-86,
scripts/train_gan_rnn_placeholder.py:117-122). Our primary metrics sink is
grep-able JSONL (cli/train.py MetricsWriter); this module adds real
``events.out.tfevents.*`` files next to it so TensorBoard works out of the
box — without paying a TensorFlow import (~12 s and hundreds of MB on this
host) inside the trainer process.

Event files are TFRecord streams of serialized ``tensorflow.Event`` protos.
Both layers are tiny and stable, so we emit them directly:

* TFRecord framing: ``len(u64) | masked_crc32c(len) | data | masked_crc32c``
  with CRC32C (Castagnoli) and TF's rotate-and-add masking.
* Event proto (event.proto): wall_time (field 1, double), step (field 2,
  int64), file_version (3, string) or summary (5, message).
* Summary proto (summary.proto): repeated Value (field 1); Value.tag
  (field 1, string) and Value.simple_value (field 2, float).

Verified against TF's own ``tf.compat.v1.train.summary_iterator`` in
tests/test_training.py.
"""

from __future__ import annotations

import os
import socket
import struct
import time
from typing import Dict

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli), table-driven, + TFRecord masking
# ---------------------------------------------------------------------------

_CRC_TABLE = []
for _i in range(256):
    _crc = _i
    for _ in range(8):
        _crc = (_crc >> 1) ^ (0x82F63B78 if _crc & 1 else 0)
    _CRC_TABLE.append(_crc)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


# ---------------------------------------------------------------------------
# protobuf wire-format encoding (just what Event/Summary need)
# ---------------------------------------------------------------------------

def _varint(value: int) -> bytes:
    out = bytearray()
    while True:
        bits = value & 0x7F
        value >>= 7
        if value:
            out.append(bits | 0x80)
        else:
            out.append(bits)
            return bytes(out)


def _key(field: int, wire_type: int) -> bytes:
    return _varint((field << 3) | wire_type)


def _double_field(field: int, value: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", value)


def _float_field(field: int, value: float) -> bytes:
    return _key(field, 5) + struct.pack("<f", value)


def _int64_field(field: int, value: int) -> bytes:
    return _key(field, 0) + _varint(value & 0xFFFFFFFFFFFFFFFF)


def _bytes_field(field: int, value: bytes) -> bytes:
    return _key(field, 2) + _varint(len(value)) + value


def encode_scalar_event(wall_time: float, step: int,
                        scalars: Dict[str, float]) -> bytes:
    """Serialize one Event proto holding simple_value summaries."""
    summary = b"".join(
        _bytes_field(1, _bytes_field(1, tag.encode("utf-8")) +
                     _float_field(2, float(value)))
        for tag, value in scalars.items())
    return (_double_field(1, wall_time) + _int64_field(2, step) +
            _bytes_field(5, summary))


def encode_version_event(wall_time: float) -> bytes:
    return (_double_field(1, wall_time) +
            _bytes_field(3, b"brain.Event:2"))


def tfrecord_frame(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (header + struct.pack("<I", masked_crc32c(header)) +
            payload + struct.pack("<I", masked_crc32c(payload)))


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

class EventFileWriter:
    """Append-only scalar summary writer, one events file per instance.

    Drop-in stand-in for the reference's ``tf.summary.FileWriter`` scalar
    usage; point TensorBoard at the parent directory.
    """

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        fname = (f"events.out.tfevents.{int(time.time())}."
                 f"{socket.gethostname()}.{os.getpid()}")
        self.path = os.path.join(logdir, fname)
        self._f = open(self.path, "ab")
        self._f.write(tfrecord_frame(encode_version_event(time.time())))
        self._f.flush()

    def add_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        payload = encode_scalar_event(time.time(), int(step), scalars)
        self._f.write(tfrecord_frame(payload))
        self._f.flush()

    def close(self) -> None:
        if not self._f.closed:
            self._f.close()

    def __enter__(self) -> "EventFileWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

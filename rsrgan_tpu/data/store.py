"""Sharded utterance store: the TPU-native replacement for TFRecords.

The reference serializes (inputs[, labels]) per utterance into TFRecord
SequenceExamples (io_funcs/make_tfrecords.py:43-91, tfrecords_io.py:12-44)
and pays a full pipeline scan just to count batches
(scripts/train_gan_rnn_placeholder.py:346-385). This store instead keeps a
flat float32 payload with a JSON index footer so that

* shards are memory-mapped (zero-copy reads, no proto parsing),
* utterance lengths are known up front (batch counts are computed, never
  scanned),
* random access is O(1) for shuffling / bucketing.

File layout (little-endian)::

    b"RTU1" | float32 payload ... | index JSON | uint64 json_len | b"RTU1"
"""

from __future__ import annotations

import json
import os
import struct
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from rsrgan_tpu.data.cmvn import Cmvn
from rsrgan_tpu.data.kaldi_ark import read_ark_matrix, read_scp

_MAGIC = b"RTU1"


class StoreWriter:
    """Append utterances to a single store shard."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "wb")
        self._f.write(_MAGIC)
        self._index: List[dict] = []

    def add(self, utt_id: str, inputs: np.ndarray,
            labels: Optional[np.ndarray] = None) -> None:
        inputs = np.ascontiguousarray(inputs, dtype="<f4")
        entry = {
            "id": utt_id,
            "io": self._f.tell(), "ir": int(inputs.shape[0]),
            "ic": int(inputs.shape[1]),
        }
        self._f.write(inputs.tobytes())
        if labels is not None:
            labels = np.ascontiguousarray(labels, dtype="<f4")
            entry.update({
                "lo": self._f.tell(), "lr": int(labels.shape[0]),
                "lc": int(labels.shape[1]),
            })
            self._f.write(labels.tobytes())
        self._index.append(entry)

    def close(self) -> None:
        blob = json.dumps(self._index).encode("utf-8")
        self._f.write(blob)
        self._f.write(struct.pack("<Q", len(blob)))
        self._f.write(_MAGIC)
        self._f.close()

    def __enter__(self) -> "StoreWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class UtteranceStore:
    """Memory-mapped random access over one or more store shards."""

    def __init__(self, paths: Sequence[str]):
        if isinstance(paths, (str, os.PathLike)):
            paths = [paths]
        self._mmaps: List[np.memmap] = []
        self._entries: List[Tuple[int, dict]] = []  # (shard, index entry)
        for shard_idx, path in enumerate(paths):
            size = os.path.getsize(path)
            with open(path, "rb") as f:
                head = f.read(4)
                if head != _MAGIC:
                    raise ValueError(f"{path}: not an RTU1 store")
                f.seek(size - 12)
                json_len, tail = struct.unpack("<Q", f.read(8))[0], f.read(4)
                if tail != _MAGIC:
                    raise ValueError(f"{path}: truncated store (bad footer)")
                f.seek(size - 12 - json_len)
                index = json.loads(f.read(json_len).decode("utf-8"))
            self._mmaps.append(np.memmap(path, dtype=np.uint8, mode="r"))
            self._entries.extend((shard_idx, e) for e in index)

    def __len__(self) -> int:
        return len(self._entries)

    @property
    def utt_ids(self) -> List[str]:
        return [e["id"] for _, e in self._entries]

    @property
    def lengths(self) -> np.ndarray:
        """Per-utterance frame counts, available without touching payloads."""
        return np.array([e["ir"] for _, e in self._entries], dtype=np.int64)

    @property
    def has_labels(self) -> bool:
        return bool(self._entries) and "lo" in self._entries[0][1]

    @property
    def input_dim(self) -> int:
        return self._entries[0][1]["ic"]

    @property
    def output_dim(self) -> Optional[int]:
        e = self._entries[0][1]
        return e.get("lc")

    def _matrix(self, shard: int, off: int, rows: int, cols: int) -> np.ndarray:
        raw = self._mmaps[shard][off:off + rows * cols * 4]
        return np.frombuffer(raw, dtype="<f4").reshape(rows, cols)

    def inputs(self, i: int) -> np.ndarray:
        shard, e = self._entries[i]
        return self._matrix(shard, e["io"], e["ir"], e["ic"])

    def labels(self, i: int) -> Optional[np.ndarray]:
        shard, e = self._entries[i]
        if "lo" not in e:
            return None
        return self._matrix(shard, e["lo"], e["lr"], e["lc"])

    def __getitem__(self, i: int):
        shard, e = self._entries[i]
        return e["id"], self.inputs(i), self.labels(i)


def build_store_from_scp(inputs_scp: str,
                         output_path: str,
                         labels_scp: Optional[str] = None,
                         inputs_cmvn: Optional[Cmvn] = None,
                         labels_cmvn: Optional[Cmvn] = None) -> int:
    """Convert paired scp files into one store shard.

    Equivalent of io_funcs/make_tfrecords.py:43-91: asserts utt-id pairing
    between the two scp files and applies global CMVN at write time. Returns
    the number of utterances written.
    """
    in_entries = read_scp(inputs_scp)
    lab_entries = read_scp(labels_scp) if labels_scp else None
    if lab_entries is not None and len(in_entries) != len(lab_entries):
        raise ValueError("inputs/labels scp length mismatch")

    count = 0
    with StoreWriter(output_path) as writer:
        for i, (utt_id, path, offset) in enumerate(in_entries):
            inputs = np.asarray(read_ark_matrix(path, offset), np.float64)
            if inputs_cmvn is not None:
                inputs = inputs_cmvn.apply(inputs)
            labels = None
            if lab_entries is not None:
                lab_id, lab_path, lab_off = lab_entries[i]
                assert lab_id == utt_id, (
                    f"utt id mismatch at line {i}: {utt_id} vs {lab_id}")
                labels = np.asarray(read_ark_matrix(lab_path, lab_off),
                                    np.float64)
                if labels_cmvn is not None:
                    labels = labels_cmvn.apply(labels)
            writer.add(utt_id, inputs, labels)
            count += 1
    return count


def read_list_file(list_file: str) -> List[str]:
    """Read a newline-separated list of shard paths (utils/misc.py:27-34)."""
    with open(list_file) as f:
        return [line.strip() for line in f if line.strip()]

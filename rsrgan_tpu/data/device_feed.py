"""Device-resident corpus: upload the store's feature payload to HBM once.

Motivation (measured on this host, BENCH_NOTES "Device-resident feed"):
the axon tunnel moves ~22 MB/s host->device with a ~30 ms dispatch floor,
so the classic host-fed loop re-ships ~2.9 GB of features per training
iteration — ~30x slower than the device step itself. ``DeviceFeed``
uploads the flat frame tables ONCE (chunked ``device_put`` + one on-device
concat) and training assembles batches on device from ``[S, B]`` int32
index plans (rsrgan_tpu/ops/gather.py), cutting per-iteration transfer to
kilobytes.

Replaces the host/device boundary of the reference's feeder-thread +
feed_dict design (scripts/train_gan_rnn_placeholder.py:30-45,463-478)
rather than mirroring it: a TPU has the HBM to hold the working corpus
(reference scale ~100 h of 257-dim LPS ~= 9 GB in bfloat16).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rsrgan_tpu.data.store import UtteranceStore

_DEFAULT_CHUNK_BYTES = 1 << 28  # 256 MB: amortizes the per-put fixed cost

_LANE = 128  # TPU minor-dim tile width


def pad_dim(d: int) -> int:
    """Feature dim rounded up to the 128-lane tile.

    Resident tables are allocated at this width so their row-major layout
    is already compact: with a non-aligned minor dim (257 -> 1.5x tile
    padding) the AOT compiler stores the upload's output column-major to
    save HBM, and the training program then re-layouts BOTH full tables
    row-major for the gather — at 20 h corpus scale those in-program
    copies alone exceeded HBM (21.2 G used of 15.75 G, round-4 phase-A
    log). Tile-aligned width makes row-major == compact, so producer and
    consumer agree on layout and the tables are gathered in place."""
    return -(-d // _LANE) * _LANE


def table_bytes(store: UtteranceStore, itemsize: int = 4) -> int:
    """HBM footprint of a store's resident tables at the given itemsize
    (tile-padded widths — what the device actually allocates)."""
    total = int(store.lengths.sum()) + 1  # +1: the zero pad row
    dims = pad_dim(store.input_dim)
    if store.has_labels:
        dims += pad_dim(store.output_dim)
    return total * dims * itemsize


@partial(jax.jit, donate_argnums=0, static_argnums=3)
def _write_chunk(table: jnp.ndarray, chunk: jnp.ndarray,
                 offset: jnp.ndarray, cast) -> jnp.ndarray:
    """In-place (donated) row-block write — keeps the upload's HBM peak at
    table + one chunk instead of the 2x-table transient a device-side
    concatenate of all chunks would need (at reference scale the f32
    tables alone are ~half of HBM; the concat peak OOMed). ``cast``
    converts a narrower wire dtype to the table dtype on device."""
    if cast:
        chunk = chunk.astype(table.dtype)
    return jax.lax.dynamic_update_slice(table, chunk,
                                        (offset, jnp.int32(0)))


def wire_dtype_for(dtype) -> np.dtype:
    """Dtype feature chunks travel in over the host->device link.

    bfloat16 tables ship as float16: numpy converts f32->f16 natively
    (ml_dtypes bf16 casts are slower on this 1-core host), the tunnel
    moves half the f32 bytes, and the on-device f16->bf16 cast is free.
    Features are CMVN-normalized z-scores (|x| < ~40), far inside f16
    range, and the f16 mantissa (10 bits) is wider than bf16's (7), so
    f32->f16->bf16 lands within 1 bf16 ulp of the direct f32->bf16
    quantization (exact except double rounding on values within an f16
    half-ulp of a bf16 rounding midpoint — tests/test_device_feed.py
    TestWireDtype pins the bound; the bf16 table is a lossy opt-in
    already, so a terminal-bit difference is inside its contract).
    float32 tables ship as float32 — they are the exactness path.
    Override with RSRGAN_FEED_WIRE_DTYPE={float32,float16,bfloat16}.
    """
    import os
    env = os.environ.get("RSRGAN_FEED_WIRE_DTYPE")
    if env:
        wire = jnp.dtype(env)
        if wire.itemsize < jnp.dtype(dtype).itemsize:
            # e.g. float16 wire under float32 tables: the f32 path is the
            # exactness contract, so a lossy override must be visible
            import sys
            print(f"[device_feed] WARNING: RSRGAN_FEED_WIRE_DTYPE={env} is "
                  f"narrower than the {jnp.dtype(dtype).name} tables — "
                  "host->device transfer is LOSSY", file=sys.stderr)
        return wire
    return np.dtype(np.float16) if jnp.dtype(dtype) == jnp.bfloat16 \
        else jnp.dtype(dtype)


def _upload_table(row_fn, n_utts: int, total_rows: int, dim: int, dtype,
                  chunk_bytes: int) -> jnp.ndarray:
    """All utterances' rows + one trailing zero row as a device array,
    uploaded in large chunks (the tunnel's per-transfer overhead makes
    many small puts slower than few big ones) into a preallocated,
    donation-updated table."""
    rows_per_chunk = max(1, chunk_bytes // (dim * 4))
    # zeros-init covers the pad row (index total_rows) AND the tile-pad
    # columns (dim..pad_dim) by construction; chunks stay compact on the
    # wire — dynamic_update_slice writes the narrow block in place.
    table = jnp.zeros((total_rows + 1, pad_dim(dim)), dtype)
    wire = wire_dtype_for(dtype)
    cast = jnp.dtype(wire) != jnp.dtype(dtype)
    written, buf, buf_rows = 0, [], 0

    def put(block: np.ndarray) -> None:
        nonlocal table, written
        chunk = jax.device_put(block.astype(wire, copy=False))
        table = _write_chunk(table, chunk, jnp.int32(written), cast)
        written += block.shape[0]

    def drain(tail: bool) -> None:
        # Emit blocks of EXACTLY rows_per_chunk (carrying the remainder)
        # so every non-tail _write_chunk shares one compiled shape —
        # utterance boundaries would otherwise make each chunk's row count
        # unique, costing one slow axon remote compile per chunk with no
        # persistent-cache reuse across corpora.
        nonlocal buf, buf_rows
        pending = np.concatenate(buf) if len(buf) > 1 else buf[0]
        off = 0
        while pending.shape[0] - off >= rows_per_chunk:
            put(pending[off:off + rows_per_chunk])
            off += rows_per_chunk
        if tail and off < pending.shape[0]:
            put(pending[off:])
            off = pending.shape[0]
        buf_rows = pending.shape[0] - off
        buf = [pending[off:]] if buf_rows else []

    for i in range(n_utts):
        m = np.asarray(row_fn(i))
        buf.append(m)
        buf_rows += m.shape[0]
        if buf_rows >= rows_per_chunk:
            drain(tail=False)
    if buf:
        drain(tail=True)
    if written != total_rows:
        # dynamic_update_slice CLAMPS out-of-range starts, so a
        # lengths-vs-rows desync would silently corrupt the table (and
        # possibly the all-zero pad row gather_sequences relies on)
        raise ValueError(
            f"store desync: uploaded {written} rows but the store index "
            f"promised {total_rows}")
    return table


class DeviceFeed:
    """Resident (inputs, labels) tables + host-side index plans.

    ``inputs_tbl``  [total+1, pad_dim(in_dim)]  (row ``total`` all-zero;
    columns past ``in_dim`` all-zero tile padding — consumers slice with
    the logical ``in_dim``/``out_dim`` attributes)
    ``labels_tbl``  [total+1, pad_dim(out_dim)] or None (test stores)
    ``plan(indices)`` -> (starts [B] int32, lengths [B] int32) numpy arrays
    ready to stack into the ``[S, B]`` plans the gathered train steps take.
    """

    def __init__(self, store: UtteranceStore, dtype=jnp.float32,
                 chunk_bytes: int = _DEFAULT_CHUNK_BYTES):
        lens = store.lengths.astype(np.int64)
        total = int(lens.sum())
        if total + 1 > np.iinfo(np.int32).max:
            raise ValueError(
                f"store has {total} frames — beyond int32 gather indices; "
                "shard the corpus across multiple training runs/hosts")
        starts = np.zeros(len(lens), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        self.starts = starts.astype(np.int32)
        self.lengths = lens.astype(np.int32)
        self.dtype = dtype
        self.in_dim = int(store.input_dim)
        self.out_dim: Optional[int] = None
        self.inputs_tbl = _upload_table(store.inputs, len(store), total,
                                        store.input_dim, dtype, chunk_bytes)
        self.labels_tbl: Optional[jnp.ndarray] = None
        if store.has_labels:
            self.out_dim = int(store.output_dim)
            self.labels_tbl = _upload_table(store.labels, len(store), total,
                                            store.output_dim, dtype,
                                            chunk_bytes)

    @property
    def num_bytes(self) -> int:
        n = self.inputs_tbl.size * self.inputs_tbl.dtype.itemsize
        if self.labels_tbl is not None:
            n += self.labels_tbl.size * self.labels_tbl.dtype.itemsize
        return int(n)

    def plan(self, indices) -> Tuple[np.ndarray, np.ndarray]:
        ix = np.asarray(indices, np.int64)
        return self.starts[ix], self.lengths[ix]

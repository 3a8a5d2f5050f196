"""Kaldi-style context splicing with edge clamping.

The reference splices frame context by slicing + repeated SYMMETRIC pads
(io_funcs/tfrecords_dataset.py:80-105, tfrecords_io.py:177-203). Padding one
row at a time with SYMMETRIC mode duplicates the edge row, so the net
semantics are simply edge-clamped context gathering::

    spliced[t] = concat(x[clip(t-L)], ..., x[t], ..., x[clip(t+R)])

which is what both implementations below compute directly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def splice_frames_np(feats: np.ndarray, left_context: int,
                     right_context: int,
                     out: np.ndarray = None) -> np.ndarray:
    """[T, D] -> [T, D * (left+1+right)] with edge-clamped context (numpy).

    Strided-slice writes instead of index gathers (2.2x faster on the
    1-core feed host — the batcher must outrun the chip). ``out`` lets the
    batcher write straight into its padded batch buffer, skipping one
    full copy.
    """
    T, D = feats.shape
    if left_context == 0 and right_context == 0:
        if out is None:
            return feats
        out[:T] = feats
        return out
    ctx = left_context + 1 + right_context
    if out is None:
        out = np.empty((T, D * ctx), feats.dtype)
    pad = np.concatenate([np.repeat(feats[:1], left_context, axis=0),
                          feats,
                          np.repeat(feats[-1:], right_context, axis=0)])
    for j in range(ctx):
        out[:T, j * D:(j + 1) * D] = pad[j:j + T]
    return out


def splice_frames(feats: jnp.ndarray, left_context: int,
                  right_context: int) -> jnp.ndarray:
    """[T, D] -> [T, D * (left+1+right)] with edge-clamped context (jax).

    Static context sizes keep the gather shapes static under jit.
    """
    if left_context == 0 and right_context == 0:
        return feats
    T = feats.shape[0]
    t = jnp.arange(T)
    cols = [feats[jnp.clip(t + off, 0, T - 1)]
            for off in range(-left_context, right_context + 1)]
    return jnp.concatenate(cols, axis=1)

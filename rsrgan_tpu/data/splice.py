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
                     right_context: int) -> np.ndarray:
    """[T, D] -> [T, D * (left+1+right)] with edge-clamped context (numpy)."""
    if left_context == 0 and right_context == 0:
        return feats
    T = feats.shape[0]
    t = np.arange(T)
    cols = [feats[np.clip(t + off, 0, T - 1)]
            for off in range(-left_context, right_context + 1)]
    return np.concatenate(cols, axis=1)


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

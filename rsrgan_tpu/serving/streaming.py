"""Streaming (chunked) enhancement for the res_lstm_l flagship.

The reference enhances whole utterances offline (batch-1 decode,
scripts/train_gan_rnn_placeholder.py:279-291). For online serving a
dereverberation front-end must process audio in small chunks with bounded
latency. The res_lstm_l generator is causal (unidirectional LSTMs +
per-frame dense), so chunked processing with carried recurrent state is
EXACT: this module recomputes the generator forward from the trained
parameter tree with explicit (c, h) state threading and a jitted
per-chunk step.

Usage::

    enhancer = StreamingEnhancer(params)        # flax params of the G
    state = enhancer.init_state(batch=1)
    for chunk in chunks:                         # [B, T_chunk, 257]
        out, state = enhancer.step(chunk, state) # [B, T_chunk, 40]
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp


def _cell_step(params, forget_bias, carry, x_t):
    """One LSTM timestep (TF LSTMCell equations, gate order i,j,f,o)."""
    c, h = carry
    gates = (jnp.concatenate([x_t, h], axis=-1) @ params["kernel"]
             + params["bias"])
    U = params["proj_kernel"].shape[0]
    i, j, f, o = [gates[:, k * U:(k + 1) * U] for k in range(4)]
    w_i = params["w_i_diag"][0]
    w_f = params["w_f_diag"][0]
    w_o = params["w_o_diag"][0]
    c_new = (jax.nn.sigmoid(f + forget_bias + w_f * c) * c
             + jax.nn.sigmoid(i + w_i * c) * jnp.tanh(j))
    m = jax.nn.sigmoid(o + w_o * c_new) * jnp.tanh(c_new)
    h_new = m @ params["proj_kernel"]
    return (c_new, h_new), h_new


@functools.partial(jax.jit, static_argnames=("num_layers", "forget_bias"))
def _stream_step(params, state, chunk, num_layers, forget_bias):
    x = jnp.swapaxes(chunk, 0, 1)  # [T, B, P]
    new_state = []
    layer_in = x
    for k in range(num_layers):
        cell = params[f"lstm_cell_{k + 1}"]
        carry, out = jax.lax.scan(
            functools.partial(_cell_step, cell, forget_bias),
            state[k], layer_in)
        new_state.append(carry)
        layer_in = out + layer_in  # res_lstm_l layer residual
    dense = params["forward_out"]
    y = layer_in @ dense["kernel"] + dense["bias"]
    return jnp.swapaxes(y, 0, 1), new_state


class StreamingEnhancer:
    """Chunked res_lstm_l generator forward with carried state."""

    def __init__(self, params, forget_bias: float = 1.0):
        """``params``: the generator's flax param dict (lstm_cell_1..4 +
        forward_out), e.g. ``state.g.params`` from a checkpoint. Params
        stay TRACED arguments of the jitted step (hot-swappable; no
        giant baked-in constants)."""
        self.params = params
        self.forget_bias = float(forget_bias)
        self.num_layers = len([k for k in params if k.startswith("lstm_cell")])
        self.num_units = params["lstm_cell_1"]["proj_kernel"].shape[0]
        self.num_proj = params["lstm_cell_1"]["proj_kernel"].shape[1]

    def init_state(self, batch: int) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        return [(jnp.zeros((batch, self.num_units), jnp.float32),
                 jnp.zeros((batch, self.num_proj), jnp.float32))
                for _ in range(self.num_layers)]

    def step(self, chunk: jnp.ndarray, state):
        """[B, T_chunk, P] -> ([B, T_chunk, out], new state).

        Exact continuation: feeding chunks back-to-back reproduces the
        whole-utterance forward bit-for-bit (see tests).
        """
        return _stream_step(self.params, state, chunk, self.num_layers,
                            self.forget_bias)

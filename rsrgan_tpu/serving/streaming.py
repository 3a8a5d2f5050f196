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


def _cell_step(params, carry, x_t):
    """One LSTM timestep (TF LSTMCell equations, gate order i,j,f,o)."""
    c, h = carry
    kernel = params["kernel"]
    D = x_t.shape[-1]
    gates = (jnp.concatenate([x_t, h], axis=-1) @ kernel
             + params["bias"])
    U = params["proj_kernel"].shape[0]
    i, j, f, o = [gates[:, k * U:(k + 1) * U] for k in range(4)]
    w_i = params["w_i_diag"][0]
    w_f = params["w_f_diag"][0]
    w_o = params["w_o_diag"][0]
    c_new = (jax.nn.sigmoid(f + 1.0 + w_f * c) * c
             + jax.nn.sigmoid(i + w_i * c) * jnp.tanh(j))
    m = jax.nn.sigmoid(o + w_o * c_new) * jnp.tanh(c_new)
    h_new = m @ params["proj_kernel"]
    return (c_new, h_new), h_new


class StreamingEnhancer:
    """Chunked res_lstm_l generator forward with carried state."""

    def __init__(self, params):
        """``params``: the generator's flax param dict (lstm_cell_1..4 +
        forward_out), e.g. ``state.g.params`` from a checkpoint."""
        self.params = params
        self.num_layers = len([k for k in params if k.startswith("lstm_cell")])
        self.num_units = params["lstm_cell_1"]["proj_kernel"].shape[0]
        self.num_proj = params["lstm_cell_1"]["proj_kernel"].shape[1]

    def init_state(self, batch: int) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        return [(jnp.zeros((batch, self.num_units), jnp.float32),
                 jnp.zeros((batch, self.num_proj), jnp.float32))
                for _ in range(self.num_layers)]

    @functools.partial(jax.jit, static_argnums=0)
    def step(self, chunk: jnp.ndarray, state):
        """[B, T_chunk, P] -> ([B, T_chunk, out], new state).

        Exact continuation: feeding chunks back-to-back reproduces the
        whole-utterance forward bit-for-bit (see tests).
        """
        x = jnp.swapaxes(chunk, 0, 1)  # [T, B, P]
        new_state = []
        layer_in = x
        for k in range(self.num_layers):
            cell = self.params[f"lstm_cell_{k + 1}"]
            carry, out = jax.lax.scan(
                functools.partial(_cell_step, cell), state[k], layer_in)
            new_state.append(carry)
            layer_in = out + layer_in  # res_lstm_l layer residual
        dense = self.params["forward_out"]
        y = layer_in @ dense["kernel"] + dense["bias"]
        return jnp.swapaxes(y, 0, 1), new_state

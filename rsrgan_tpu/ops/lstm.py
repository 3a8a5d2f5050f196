"""Peephole + projection LSTM for TPU.

Functional equivalent of ``tf.contrib.rnn.LSTMCell(num_units,
use_peepholes=True, num_proj=..., forget_bias=1.0, activation=tanh)`` driven
by ``tf.nn.dynamic_rnn(sequence_length=...)`` — the recurrent workhorse of
the reference's generators and discriminators
(/root/reference/models/res_lstm_l.py:86-93,104-108,
/root/reference/models/discriminator_lstm.py:70-91).

TPU-first design decisions:

* The input projection ``x @ W_x`` for ALL timesteps is hoisted out of the
  recurrence into one [T*B, D] x [D, 4U] matmul (MXU-sized, bf16-capable),
  so the ``lax.scan`` body only contains the [B, P] x [P, 4U] recurrent
  matmul plus VPU elementwise work.
* Sequence-major ``[T, B, ...]`` layout inside the scan (no per-step
  transposes), batch-major at the module boundary to match the reference's
  ``[B, T, D]`` API.
* Length masking reproduces dynamic_rnn semantics exactly: past a
  sequence's end the carried state freezes and emitted outputs are zero.
* Gate order matches TF's (i, j, f, o) and the combined [D+P, 4U] kernel is
  glorot-initialized as one matrix, like TF's single ``kernel`` variable, so
  initialization statistics line up.

The fused Pallas kernel backend is selected with ``lstm_impl='pallas'``
(see rsrgan_tpu/ops/pallas_lstm.py).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class LstmCellP(nn.Module):
    """One LSTM layer with peepholes + projection, scanned over time.

    Call: (inputs [B, T, D], lengths [B] or None) -> outputs [B, T, P].
    """

    num_units: int
    num_proj: int
    forget_bias: float = 1.0
    use_peepholes: bool = True
    compute_dtype: Any = jnp.float32  # matmul dtype (bf16 for speed)
    lstm_impl: str = "scan"  # "scan" (lax.scan) | "pallas" (fused kernel)

    @nn.compact
    def __call__(self, inputs: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None,
                 save_acts: bool = True) -> jnp.ndarray:
        # save_acts=False (inference) skips the backward's saved-activation
        # stream in the fused kernel; such a forward is not differentiable
        B, T, D = inputs.shape
        U, P = self.num_units, self.num_proj

        kernel = self.param("kernel", nn.initializers.glorot_uniform(),
                            (D + P, 4 * U), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (4 * U,),
                          jnp.float32)
        proj = self.param("proj_kernel", nn.initializers.glorot_uniform(),
                          (U, P), jnp.float32)
        if self.use_peepholes:
            w_i = self.param("w_i_diag", nn.initializers.glorot_uniform(),
                             (1, U), jnp.float32)[0]
            w_f = self.param("w_f_diag", nn.initializers.glorot_uniform(),
                             (1, U), jnp.float32)[0]
            w_o = self.param("w_o_diag", nn.initializers.glorot_uniform(),
                             (1, U), jnp.float32)[0]

        cdt = self.compute_dtype
        w_x, w_h = kernel[:D], kernel[D:]

        # Hoisted input projection: one big MXU matmul over all timesteps.
        x_tm = jnp.swapaxes(inputs, 0, 1)  # [T, B, D]
        xw = jnp.einsum("tbd,du->tbu", x_tm.astype(cdt), w_x.astype(cdt)
                        ).astype(jnp.float32)  # [T, B, 4U]

        if self.lstm_impl == "pallas":
            if not self.use_peepholes:
                raise NotImplementedError(
                    "pallas path assumes peephole cells")
            from rsrgan_tpu.ops.pallas_lstm import lstm_seq

            out = lstm_seq(xw, lengths, w_h, proj, bias, w_i, w_f, w_o,
                           self.forget_bias, compute_dtype=cdt,
                           save_acts=save_acts)
            return jnp.swapaxes(out, 0, 1)

        if lengths is not None:
            step_mask = (jnp.arange(T)[:, None]
                         < lengths[None, :].astype(jnp.int32))  # [T, B]
        else:
            step_mask = jnp.ones((T, B), dtype=bool)

        w_h_c = w_h.astype(cdt)
        proj_c = proj.astype(cdt)

        def step(carry, scan_in):
            c_prev, h_prev = carry  # [B, U] f32, [B, P] f32
            xw_t, mask_t = scan_in  # [B, 4U], [B]
            gates = xw_t + (h_prev.astype(cdt) @ w_h_c).astype(jnp.float32)
            gates = gates + bias
            i, j, f, o = jnp.split(gates, 4, axis=1)
            if self.use_peepholes:
                c = (jax.nn.sigmoid(f + self.forget_bias + w_f * c_prev)
                     * c_prev
                     + jax.nn.sigmoid(i + w_i * c_prev) * jnp.tanh(j))
                m = jax.nn.sigmoid(o + w_o * c) * jnp.tanh(c)
            else:
                c = (jax.nn.sigmoid(f + self.forget_bias) * c_prev
                     + jax.nn.sigmoid(i) * jnp.tanh(j))
                m = jax.nn.sigmoid(o) * jnp.tanh(c)
            h = (m.astype(cdt) @ proj_c).astype(jnp.float32)

            keep = mask_t[:, None]
            c = jnp.where(keep, c, c_prev)
            h_state = jnp.where(keep, h, h_prev)
            out = jnp.where(keep, h, 0.0)
            return (c, h_state), out

        init = (jnp.zeros((B, U), jnp.float32), jnp.zeros((B, P), jnp.float32))
        _, outputs = jax.lax.scan(step, init, (xw, step_mask))
        return jnp.swapaxes(outputs, 0, 1)  # [B, T, P]


class StackedLstm(nn.Module):
    """MultiRNNCell equivalent: N stacked LstmCellP layers."""

    num_layers: int
    num_units: int
    num_proj: int
    compute_dtype: Any = jnp.float32
    dropout_keep_prob: float = 1.0
    lstm_impl: str = "scan"

    @nn.compact
    def __call__(self, inputs, lengths=None, train: bool = False):
        use_dropout = train and self.dropout_keep_prob < 1.0
        if self.lstm_impl == "wavefront" and not use_dropout \
                and inputs.shape[-1] == self.num_proj:
            from rsrgan_tpu.models.recurrent import _CellParams
            from rsrgan_tpu.ops.wavefront_stack import lstm_stack_wavefront

            params = [
                _CellParams(self.num_proj, self.num_units, self.num_proj,
                            name=f"cell_{k}")()
                for k in range(self.num_layers)]
            return lstm_stack_wavefront(inputs, lengths, params,
                                        residual=False,
                                        compute_dtype=self.compute_dtype,
                                        save_acts=train)

        impl = "pallas" if self.lstm_impl == "wavefront" else self.lstm_impl
        h = inputs
        for layer in range(self.num_layers):
            h = LstmCellP(self.num_units, self.num_proj,
                          compute_dtype=self.compute_dtype,
                          lstm_impl=impl,
                          name=f"cell_{layer}")(h, lengths,
                                                save_acts=train)
            if use_dropout:
                h = nn.Dropout(rate=1.0 - self.dropout_keep_prob,
                               deterministic=False)(h)
        return h

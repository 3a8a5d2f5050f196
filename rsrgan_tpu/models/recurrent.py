"""Recurrent generators: LSTM, BNLSTM, RES_LSTM_{BASE,I,L}.

Flax re-implementations of the reference generator zoo
(/root/reference/models/lstm.py, bnlstm.py, res_lstm_base.py,
res_lstm_i.py, res_lstm_l.py). All take batch-major ``[B, T, D]`` features
plus true lengths and return ``[B, T, output_dim]``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from rsrgan_tpu.ops.bnlstm import BnLstmCell
from rsrgan_tpu.ops.common import leakyrelu
from rsrgan_tpu.ops.lstm import LstmCellP, StackedLstm

_GLOROT = nn.initializers.glorot_uniform()


class LstmGenerator(nn.Module):
    """models/lstm.py:41-129 — leakyrelu FC to 280, 3x LSTM(760, proj 280),
    linear out."""

    output_dim: int
    cell_size: int = 760
    num_projection: int = 280
    num_layers: int = 3
    keep_prob: float = 1.0
    compute_dtype: Any = jnp.float32
    lstm_impl: str = "scan"

    @nn.compact
    def __call__(self, inputs, lengths=None, train: bool = False):
        h = nn.Dense(self.num_projection, kernel_init=_GLOROT)(inputs)
        h = leakyrelu(h)
        h = StackedLstm(self.num_layers, self.cell_size, self.num_projection,
                        compute_dtype=self.compute_dtype,
                        lstm_impl=self.lstm_impl,
                        dropout_keep_prob=self.keep_prob)(h, lengths, train)
        return nn.Dense(self.output_dim, kernel_init=_GLOROT)(h)


class BnLstmGenerator(nn.Module):
    """models/bnlstm.py:38-127 — relu FC to 280, 3x recurrent-BN LSTM cells,
    linear out."""

    output_dim: int
    cell_size: int = 760
    num_projection: int = 280
    num_layers: int = 3
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, lengths=None, train: bool = False):
        h = nn.relu(nn.Dense(self.num_projection, kernel_init=_GLOROT)(inputs))
        for layer in range(self.num_layers):
            h = BnLstmCell(self.cell_size, self.num_projection,
                           compute_dtype=self.compute_dtype,
                           name=f"cell_{layer}")(h, lengths, train)
        return nn.Dense(self.output_dim, kernel_init=_GLOROT)(h)


class _CellParams(nn.Module):
    """Parameter-only twin of LstmCellP: declares the identical variable
    tree (kernel/bias/proj_kernel/peepholes) under the same submodule name
    so wavefront checkpoints interchange with scan/pallas ones."""

    input_dim: int
    num_units: int
    num_proj: int

    @nn.compact
    def __call__(self):
        D, U, P = self.input_dim, self.num_units, self.num_proj
        return {
            "kernel": self.param("kernel",
                                 nn.initializers.glorot_uniform(),
                                 (D + P, 4 * U), jnp.float32),
            "bias": self.param("bias", nn.initializers.zeros, (4 * U,),
                               jnp.float32),
            "proj_kernel": self.param("proj_kernel",
                                      nn.initializers.glorot_uniform(),
                                      (U, P), jnp.float32),
            "w_i_diag": self.param("w_i_diag",
                                   nn.initializers.glorot_uniform(),
                                   (1, U), jnp.float32),
            "w_f_diag": self.param("w_f_diag",
                                   nn.initializers.glorot_uniform(),
                                   (1, U), jnp.float32),
            "w_o_diag": self.param("w_o_diag",
                                   nn.initializers.glorot_uniform(),
                                   (1, U), jnp.float32),
        }


class ResLstmGenerator(nn.Module):
    """The residual-LSTM family; ``variant`` selects the wiring:

    * "base": 4 stacked LSTM(760, proj=input_dim), no residual, out from
      outputs4 (models/res_lstm_base.py:110-196)
    * "i": 2 layers, input residual — every layer input and the output tap
      add the ORIGINAL inputs (models/res_lstm_i.py:100-192)
    * "l" (flagship): 4 layers, layer residual — inputs_{k+1} = outputs_k +
      inputs_k, out from outputs4 + inputs4 (models/res_lstm_l.py:101-194)

    The projection size equals the input feature dim (257) so residual adds
    type-check, exactly as the reference requires.
    """

    output_dim: int
    variant: str = "l"
    cell_size: int = 760
    keep_prob: float = 1.0
    compute_dtype: Any = jnp.float32
    lstm_impl: str = "scan"

    @nn.compact
    def __call__(self, inputs, lengths=None, train: bool = False):
        num_proj = inputs.shape[-1]
        num_layers = 2 if self.variant == "i" else 4

        use_dropout = train and self.keep_prob < 1.0
        # the fused stack covers the "l" (layer-residual) and "base"
        # (plain MultiRNNCell) wirings; "i" taps the ORIGINAL inputs at
        # the top (out2 + x), which the kernel's per-layer handoff does
        # not express — it falls through to the per-layer kernels below
        if (self.lstm_impl == "wavefront" and not use_dropout
                and self.variant in ("l", "base")):
            from rsrgan_tpu.ops.wavefront_stack import lstm_stack_wavefront

            params = [
                _CellParams(num_proj, self.cell_size, num_proj,
                            name=f"lstm_cell_{k + 1}")()
                for k in range(num_layers)]
            tap = lstm_stack_wavefront(inputs, lengths, params,
                                       residual=self.variant == "l",
                                       compute_dtype=self.compute_dtype,
                                       save_acts=train)
            return nn.Dense(self.output_dim, kernel_init=_GLOROT,
                            name="forward_out")(tap)

        # dropout between layers (or the "i" wiring) forces the per-layer
        # path (the fused stack has no dropout points), mirroring
        # StackedLstm's fallback
        impl = ("pallas" if self.lstm_impl == "wavefront"
                else self.lstm_impl)

        def cell(idx):
            mod = LstmCellP(self.cell_size, num_proj,
                            compute_dtype=self.compute_dtype,
                            lstm_impl=impl,
                            name=f"lstm_cell_{idx + 1}")
            return lambda h, lens: mod(h, lens, save_acts=train)

        def dropout(h):
            if train and self.keep_prob < 1.0:
                return nn.Dropout(rate=1.0 - self.keep_prob,
                                  deterministic=False)(h)
            return h

        if self.variant == "base":
            h = inputs
            for k in range(num_layers):
                h = dropout(cell(k)(h, lengths))
            tap = h
        elif self.variant == "i":
            out1 = dropout(cell(0)(inputs, lengths))
            out2 = dropout(cell(1)(out1 + inputs, lengths))
            tap = out2 + inputs
        elif self.variant == "l":
            layer_in = inputs
            for k in range(num_layers):
                out_k = dropout(cell(k)(layer_in, lengths))
                tap = out_k + layer_in
                layer_in = tap
        else:
            raise ValueError(f"unknown res_lstm variant {self.variant}")

        return nn.Dense(self.output_dim, kernel_init=_GLOROT,
                        name="forward_out")(tap)

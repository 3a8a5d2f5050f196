"""Discriminators: frame DNN-D and sequence LSTM-D.

Flax re-implementations of /root/reference/models/discriminator_dnn.py and
discriminator_lstm.py. The SEGAN conv discriminator lives in
rsrgan_tpu/models/segan.py.
"""

from __future__ import annotations

from math import sqrt
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from rsrgan_tpu.ops.common import gaussian_noise
from rsrgan_tpu.ops.lstm import StackedLstm

_GLOROT = nn.initializers.glorot_uniform()


class DnnDiscriminator(nn.Module):
    """discriminator_dnn.py:21-98 — 4x1024 ReLU (He-ish truncated-normal
    init), linear 1-unit out clipped to [-0.5, 1.5]."""

    units: int = 1024
    hidden_layers: int = 3
    keep_prob: float = 1.0
    clip_output: bool = True

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        relu_init = nn.initializers.truncated_normal(
            stddev=sqrt(2.0 / self.units))
        h = inputs
        for _ in range(1 + self.hidden_layers):
            h = nn.relu(nn.Dense(self.units, kernel_init=relu_init)(h))
            if train and self.keep_prob < 1.0:
                h = nn.Dropout(rate=1.0 - self.keep_prob,
                               deterministic=False)(h)
        y = nn.Dense(1, kernel_init=_GLOROT)(h)
        if self.clip_output:
            y = jnp.clip(y, -0.5, 1.5)  # discriminator_dnn.py:93
        return y


class LstmDiscriminator(nn.Module):
    """discriminator_lstm.py:24-110 — annealed gaussian input noise, 2x
    LSTM(256, proj 40, peepholes), per-timestep linear 1-unit logit.

    ``noise_std`` may be a traced scalar (the exponentially decayed
    disc_noise_std); noise is applied whenever a 'noise' rng is provided —
    the reference applies it unconditionally, during CV evaluation too
    (discriminator_lstm.py:60). Dropout alone is gated on ``train``.
    """

    cell_size: int = 256
    num_projection: int = 40
    num_layers: int = 2
    keep_prob: float = 1.0
    compute_dtype: Any = jnp.float32
    lstm_impl: str = "scan"

    # Row-count crossover for the fused wavefront stack on the small D
    # cells, measured at the FULL-training-step level for B=16 (per-layer
    # pallas wins: 425.8k vs 419-420k frames/s) and at module level for
    # B=64/256 (wavefront wins 11-23%: tools/exp_d_impl.py, 2026-08-17).
    # Calls see B rows (G-step D forwards) or 2B rows (stacked
    # D(real)/D(fake) step), so the choice adapts per call shape.
    WAVEFRONT_MIN_ROWS = 64

    @nn.compact
    def __call__(self, inputs, lengths=None, noise_std=0.0,
                 train: bool = False):
        h = inputs
        if self.has_rng("noise"):
            h = gaussian_noise(self.make_rng("noise"), h, noise_std)
        impl = self.lstm_impl
        if (impl == "wavefront"
                and inputs.shape[0] < self.WAVEFRONT_MIN_ROWS):
            impl = "pallas"
        h = StackedLstm(self.num_layers, self.cell_size, self.num_projection,
                        compute_dtype=self.compute_dtype,
                        lstm_impl=impl,
                        dropout_keep_prob=self.keep_prob)(h, lengths, train)
        return nn.Dense(1, kernel_init=_GLOROT)(h)  # [B, T, 1]

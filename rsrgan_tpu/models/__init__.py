"""Model zoo + registry.

``get_generator(g_type, ...)`` mirrors the reference's string dispatch
(models/gan_rnn_placeholder.py:125-132, rnn_trainer.py:97-108,
dnn_trainer.py:94-101). Sequence generators take (inputs [B,T,D], lengths,
train); frame generators take spliced frames.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from rsrgan_tpu.models.feedforward import (CnnGenerator, DnnGenerator,
                                           RcedGenerator)
from rsrgan_tpu.models.discriminators import (DnnDiscriminator,
                                              LstmDiscriminator)
from rsrgan_tpu.models.recurrent import (BnLstmGenerator, LstmGenerator,
                                         ResLstmGenerator)

SEQUENCE_G_TYPES = ("lstm", "bnlstm", "res_lstm_base", "res_lstm_i",
                    "res_lstm_l")
FRAME_G_TYPES = ("dnn", "rced", "cnn")


def get_generator(g_type: str, *, input_dim: int, output_dim: int,
                  left_context: int = 0, right_context: int = 0,
                  keep_prob: float = 1.0, batch_norm: bool = False,
                  compute_dtype: Any = jnp.float32,
                  lstm_impl: str = "scan"):
    splice = left_context + 1 + right_context
    if g_type == "lstm":
        return LstmGenerator(output_dim=output_dim, keep_prob=keep_prob,
                             compute_dtype=compute_dtype,
                             lstm_impl=lstm_impl)
    if g_type == "bnlstm":
        return BnLstmGenerator(output_dim=output_dim,
                               compute_dtype=compute_dtype)
    if g_type in ("res_lstm_base", "res_lstm_i", "res_lstm_l"):
        return ResLstmGenerator(output_dim=output_dim,
                                variant=g_type.rsplit("_", 1)[-1],
                                keep_prob=keep_prob,
                                compute_dtype=compute_dtype,
                                lstm_impl=lstm_impl)
    if g_type == "dnn":
        return DnnGenerator(output_dim=output_dim, keep_prob=keep_prob,
                            batch_norm=batch_norm)
    if g_type == "rced":
        return RcedGenerator(output_dim=output_dim, input_dim=input_dim,
                             splice=splice, batch_norm=batch_norm)
    if g_type == "cnn":
        return CnnGenerator(output_dim=output_dim, input_dim=input_dim,
                            splice=splice)
    raise ValueError(f"Unrecognized G type {g_type}")


def get_discriminator(d_type: str, *, keep_prob: float = 1.0,
                      compute_dtype: Any = jnp.float32,
                      lstm_impl: str = "scan"):
    # "wavefront" passes through: LstmDiscriminator picks the backend per
    # call shape (per-layer pallas below WAVEFRONT_MIN_ROWS rows, the
    # fused stack above — see the measurement note on that constant).
    if d_type == "lstm":
        return LstmDiscriminator(keep_prob=keep_prob,
                                 compute_dtype=compute_dtype,
                                 lstm_impl=lstm_impl)
    if d_type == "dnn":
        return DnnDiscriminator(keep_prob=keep_prob)
    raise ValueError(f"Unrecognized D type {d_type}")

"""Loss functions with the reference's exact scaling conventions.

All means are taken over the full padded tensors, matching the reference's
``tf.reduce_mean`` / ``tf.losses.mean_squared_error`` over padded batches
(models/gan_rnn_placeholder.py:244-260) — at padded timesteps both
implementations emit the same deterministic values (zero LSTM outputs ->
output-layer bias), so the conventions line up.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lsgan_d_losses(d_rl_logits: jnp.ndarray, d_fk_logits: jnp.ndarray,
                   d_real=1.0, d_fake=0.0):
    """LSGAN discriminator losses (gan_rnn_placeholder.py:244-249).

    Returns (d_rl_loss, d_fk_loss, d_loss)."""
    d_rl = jnp.mean(jnp.square(d_rl_logits - d_real))
    d_fk = jnp.mean(jnp.square(d_fk_logits - d_fake))
    return d_rl, d_fk, d_rl + d_fk


def lsgan_g_adv_loss(d_fk_logits: jnp.ndarray, d_real=1.0) -> jnp.ndarray:
    """(D(G(x)) - d_real)^2 (gan_rnn_placeholder.py:246)."""
    return jnp.mean(jnp.square(d_fk_logits - d_real))


def g_mse_loss(g_out: jnp.ndarray, labels: jnp.ndarray,
               output_dim: int) -> jnp.ndarray:
    """0.5 * MSE * output_dim (gan_rnn_placeholder.py:252)."""
    return 0.5 * jnp.mean(jnp.square(g_out - labels)) * output_dim


def l2_loss_nonbias(params, l2_scale: float) -> jnp.ndarray:
    """Manual L2 on non-bias weights: sum(||v||^2 / 2) * scale
    (gan_rnn_placeholder.py:253-258; 'bias' name filter preserved)."""
    if l2_scale <= 0.0:
        return jnp.asarray(0.0, jnp.float32)
    total = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
        if "bias" in name:
            continue
        total = total + 0.5 * jnp.sum(jnp.square(leaf))
    return total * l2_scale

"""LSTM cell with recurrent batch normalization (arXiv 1603.09025).

Port of the reference's custom cell (/root/reference/models/BNLSTMCell.py:
20-217): separate input/state kernels, batch norm applied to ``x @ W_xh``,
``h @ W_hh`` and the cell state, peepholes and projection. BN scale/offset
and moving statistics are shared across timesteps; during training each
step normalizes with that step's batch statistics and moving stats are
folded with decay 0.999 per step (carried through the scan, written back
once to the 'batch_stats' collection).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_DECAY = 0.999
BN_EPS = 1e-3


class BnLstmCell(nn.Module):
    """One recurrent-batch-norm LSTM layer scanned over time.

    Call: (inputs [B, T, D], lengths [B]|None, train) -> [B, T, P].
    """

    num_units: int
    num_proj: int
    forget_bias: float = 1.0
    use_peepholes: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        B, T, D = inputs.shape
        U, P = self.num_units, self.num_proj

        w_xh = self.param("input_kernel", nn.initializers.glorot_uniform(),
                          (D, 4 * U), jnp.float32)
        w_hh = self.param("state_kernel", nn.initializers.glorot_uniform(),
                          (P, 4 * U), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (4 * U,), jnp.float32)
        w_proj = self.param("projection_kernel",
                            nn.initializers.glorot_uniform(), (U, P),
                            jnp.float32)
        if self.use_peepholes:
            w_i = self.param("w_i_diag", nn.initializers.glorot_uniform(),
                             (1, U), jnp.float32)[0]
            w_f = self.param("w_f_diag", nn.initializers.glorot_uniform(),
                             (1, U), jnp.float32)[0]
            w_o = self.param("w_o_diag", nn.initializers.glorot_uniform(),
                             (1, U), jnp.float32)[0]

        # BN parameters: scale init 0.1 like the reference (BNLSTMCell.py:25-28)
        def bn_params(name, size):
            scale = self.param(f"{name}_scale",
                               nn.initializers.constant(0.1), (size,),
                               jnp.float32)
            offset = self.param(f"{name}_offset", nn.initializers.zeros,
                                (size,), jnp.float32)
            mean = self.variable("batch_stats", f"{name}_mean",
                                 jnp.zeros, (size,))
            var = self.variable("batch_stats", f"{name}_var",
                                jnp.ones, (size,))
            return scale, offset, mean, var

        bn_x = bn_params("input", 4 * U)
        bn_h = bn_params("state", 4 * U)
        bn_c = bn_params("cell", U)

        def norm(x, scale, offset, mov_mean, mov_var):
            """Returns (normalized, batch_mean, batch_var)."""
            if train:
                mean = jnp.mean(x, axis=0)
                var = jnp.var(x, axis=0)
            else:
                mean, var = mov_mean, mov_var
            y = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * scale + offset
            return y, mean, var

        cdt = self.compute_dtype
        x_tm = jnp.swapaxes(inputs, 0, 1)
        xw = jnp.einsum("tbd,du->tbu", x_tm.astype(cdt),
                        w_xh.astype(cdt)).astype(jnp.float32)
        if lengths is not None:
            step_mask = (jnp.arange(T)[:, None]
                         < lengths[None, :].astype(jnp.int32))
        else:
            step_mask = jnp.ones((T, B), dtype=bool)

        w_hh_c = w_hh.astype(cdt)
        w_proj_c = w_proj.astype(cdt)

        def step(carry, scan_in):
            c_prev, h_prev, stats = carry
            xw_t, mask_t = scan_in
            hh = (h_prev.astype(cdt) @ w_hh_c).astype(jnp.float32)

            nx, mx, vx = norm(xw_t, bn_x[0], bn_x[1], stats[0], stats[1])
            nh, mh, vh = norm(hh, bn_h[0], bn_h[1], stats[2], stats[3])
            gates = nx + nh + bias
            i, j, f, o = jnp.split(gates, 4, axis=1)
            if self.use_peepholes:
                c = (jax.nn.sigmoid(f + self.forget_bias + w_f * c_prev)
                     * c_prev
                     + jax.nn.sigmoid(i + w_i * c_prev) * jnp.tanh(j))
            else:
                c = (jax.nn.sigmoid(f + self.forget_bias) * c_prev
                     + jax.nn.sigmoid(i) * jnp.tanh(j))
            nc, mc, vc = norm(c, bn_c[0], bn_c[1], stats[4], stats[5])
            if self.use_peepholes:
                m = jax.nn.sigmoid(o + w_o * c) * jnp.tanh(nc)
            else:
                m = jax.nn.sigmoid(o) * jnp.tanh(nc)
            h = (m.astype(cdt) @ w_proj_c).astype(jnp.float32)

            keep = mask_t[:, None]
            c = jnp.where(keep, c, c_prev)
            h_state = jnp.where(keep, h, h_prev)
            out = jnp.where(keep, h, 0.0)
            if train:
                # sequential moving-average fold, decay per step
                # (BNLSTMCell.py:38-41); frozen on masked-out steps
                any_valid = jnp.any(mask_t)
                def fold(old, new):
                    return jnp.where(any_valid,
                                     old * BN_DECAY + new * (1 - BN_DECAY),
                                     old)
                stats = (fold(stats[0], mx), fold(stats[1], vx),
                         fold(stats[2], mh), fold(stats[3], vh),
                         fold(stats[4], mc), fold(stats[5], vc))
            return (c, h_state, stats), out

        stats0 = (bn_x[2].value, bn_x[3].value, bn_h[2].value, bn_h[3].value,
                  bn_c[2].value, bn_c[3].value)
        init = (jnp.zeros((B, U), jnp.float32),
                jnp.zeros((B, P), jnp.float32), stats0)
        (c_f, h_f, stats_f), outputs = jax.lax.scan(step, init,
                                                    (xw, step_mask))
        if train and self.is_mutable_collection("batch_stats"):
            for var, val in zip(
                    (bn_x[2], bn_x[3], bn_h[2], bn_h[3], bn_c[2], bn_c[3]),
                    stats_f):
                var.value = val
        return jnp.swapaxes(outputs, 0, 1)

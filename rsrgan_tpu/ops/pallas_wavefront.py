"""Wavefront-fused multi-layer LSTM forward for the res_lstm_l stack.

The flagship generator runs four LSTM layers with layer residuals
(in_{k+1} = out_k + in_k, /root/reference/models/res_lstm_l.py:101-194).
Running them as four separate sequence kernels pays the per-grid-step
fixed cost four times and round-trips every layer's output through HBM.

This kernel runs ALL layers in one Mosaic program on a software pipeline:
at grid step s, layer k processes timestep t = s - k (when 0 <= t < T), so
after a 3-step fill the four layers advance in lockstep. Layer k's input
at t is tap_{k-1}(t) = out_{k-1}(t) + in_{k-1}(t), produced on the
previous grid step and handed over through VMEM scratch. Because layer
inputs are only known in-kernel, layers >= 2 compute their input
projection in-kernel (one [B, P] x [P, 4Up] matmul each — same FLOPs as
the hoisted xw, just not batched over T); layer 1 still consumes the
pre-computed xw stream.

Backward reuses the single-layer reverse kernel from pallas_lstm per
layer: res_lstm_l's closed form in_k = x + sum_{j<k} out_j reconstructs
each layer's inputs from the saved h_hists, so xw_k is recomputed as one
big XLA matmul and the gradient chain d(tap_k) runs layer-by-layer in
plain JAX. See ResLstmWavefront in rsrgan_tpu/models/recurrent.py for the
module wiring.

Status: forward kernel + reference-parity tests; used by
``lstm_impl='wavefront'`` on the res_lstm_l generator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsrgan_tpu.ops.pallas_lstm import _round_up, _vmem_limit, pad_gate_dim


def _wavefront_kernel(L, T, residual, save_acts, xw1_ref, mask_ref, x_ref,
                      wx_ref, wh_ref, proj_ref, bias_ref,
                      wi_ref, wf_ref, wo_ref,
                      tap_ref, c_hist_ref, h_hist_ref, *rest):
    if save_acts:
        acts_ref, c_scr, h_scr, in_scr = rest
    else:
        acts_ref, (c_scr, h_scr, in_scr) = None, rest
    """One grid step of the L-layer wavefront.

    Refs:
      xw1_ref   [1, B, G]     layer-1 input projection at t = s
      mask_ref  [L, 1, B]     mask rows for t = s-k, k = 0..L-1
      x_ref     [1, B, P]     raw input x(t = s-1) (feeds layer 2's tap)
      wx_ref    [L-1, P, G]   in-kernel input kernels for layers 2..L
      wh_ref    [L, P, G]     recurrent kernels
      proj_ref  [L, Up, P]    projections
      bias_ref  [L, 1, G]     biases (forget_bias folded)
      w*_ref    [L, 1, Up]    peepholes
    Outputs (written at each layer's wavefront position):
      tap_ref    [L, 1, B, P]  tap_k(t) = out_k(t) + in_k(t)   (post-mask)
      c_hist_ref [L, 1, B, Up] post-mask cell state per layer
      h_hist_ref [L, 1, B, P]  post-mask hidden state per layer
      acts_ref   [L, 1, B, G]  gate activations [si, tj, sf, so] (saved
                               for the backward — no gates recompute)
    Scratch:
      c_scr [L, B, Up], h_scr [L, B, P] — recurrent states
      in_scr [L, B, P] — in_k(t) handoff: slot k holds the input the layer
      k+1 will consume on the NEXT grid step (= tap_k(t)); slot 0 unused.
    """
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        c_scr[...] = jnp.zeros_like(c_scr)
        h_scr[...] = jnp.zeros_like(h_scr)
        in_scr[...] = jnp.zeros_like(in_scr)

    # reverse order: layer k+1 must read its handoff slot (written by
    # layer k on the PREVIOUS grid step) before layer k overwrites it
    for k in reversed(range(L)):
        t = s - k

        @pl.when(jnp.logical_and(t >= 0, t < T))
        def _(k=k, t=t):
            wdt = wh_ref.dtype
            if k == 0:
                xw_t = xw1_ref[0]
                in_k = x_ref[0]  # x(t) — only needed to form tap_0
            else:
                in_k = in_scr[k]
                xw_t = jnp.dot(in_k.astype(wdt), wx_ref[k - 1],
                               preferred_element_type=jnp.float32)
            c_prev = c_scr[k]
            h_prev = h_scr[k]
            gates = (xw_t
                     + jnp.dot(h_prev.astype(wdt), wh_ref[k],
                               preferred_element_type=jnp.float32)
                     + bias_ref[k, 0])
            Up = c_prev.shape[-1]
            i = gates[:, 0 * Up:1 * Up]
            j = gates[:, 1 * Up:2 * Up]
            f = gates[:, 2 * Up:3 * Up]
            o = gates[:, 3 * Up:4 * Up]
            w_i = wi_ref[k, 0]
            w_f = wf_ref[k, 0]
            w_o = wo_ref[k, 0]
            si = jax.nn.sigmoid(i + w_i * c_prev)
            sf = jax.nn.sigmoid(f + w_f * c_prev)
            tj = jnp.tanh(j)
            c_new = sf * c_prev + si * tj
            so = jax.nn.sigmoid(o + w_o * c_new)
            m = so * jnp.tanh(c_new)
            h_new = jnp.dot(m.astype(wdt), proj_ref[k],
                            preferred_element_type=jnp.float32)

            keep = mask_ref[k, 0, 0][:, None] > 0
            c_keep = jnp.where(keep, c_new, c_prev)
            h_keep = jnp.where(keep, h_new, h_prev)
            c_scr[k] = c_keep
            h_scr[k] = h_keep
            out = jnp.where(keep, h_new, 0.0)
            # residual (res_lstm_l): tap_k = out_k + in_k; plain stack
            # (MultiRNNCell): the next layer consumes out_k directly
            tap = out + in_k if residual else out
            if k + 1 < L:
                in_scr[k + 1] = tap
            tap_ref[k, 0] = tap
            c_hist_ref[k, 0] = c_keep
            h_hist_ref[k, 0] = h_keep
            if save_acts:
                acts_ref[k, 0] = jnp.concatenate(
                    [si, tj, sf, so], axis=1).astype(acts_ref.dtype)


def lstm_wavefront_fwd(xw1, mask_lt, x, wx, wh, proj, bias,
                       wi, wf, wo, residual=True, save_acts=True):
    """Launch the wavefront forward.

    xw1 [T, B, G] layer-1 projection; mask_lt [L, T+L, 1, B] per-layer
    shifted masks (mask_lt[k, s] = mask(t=s-k), zero outside);
    x [T+1, B, P] raw inputs padded with a leading zero row is NOT needed —
    x here is [T, B, P] and indexed at t=s (same position as layer 1).
    Weight stacks: wx [L-1, P, G], wh [L, P, G], proj [L, Up, P],
    bias [L, 1, G], peepholes [L, 1, Up].

    Returns (taps [L, T, B, P], c_hist [L, T, B, Up], h_hist [L, T, B, P],
    acts [L, T, B, G]) — each [k] only valid at wavefront-consistent
    positions; taps[L-1] is the generator tap, taps[:L-1] equal the
    inputs of the next layer; acts are the saved gate activations.
    """
    T, B, G = xw1.shape
    L = wh.shape[0]
    Up = G // 4
    P = proj.shape[2]
    S = T + L - 1

    # The Mosaic default scoped-VMEM budget is 16 MB — smaller than the
    # chip's physical VMEM. Large batches (B >= 128 at flagship size) need
    # more; size the limit from the actual block footprint (padded tiles,
    # double-buffered streams); _vmem_limit adds the measured headroom.
    wbytes = jnp.dtype(wh.dtype).itemsize
    ps, pl_ = _round_up(P, 8), _round_up(P, 128)
    weights = ((L - 1) * ps * G + L * ps * G) * wbytes \
        + L * Up * pl_ * wbytes + L * (G + 3 * Up) * 4
    stream = 2 * (B * G * 4 + B * pl_ * 4)                      # xw1, x
    outs = 2 * L * (2 * B * pl_ * 4 + B * Up * 4
                    + (B * G * wbytes if save_acts else 0))
    scratch = L * (B * Up + 2 * B * pl_) * 4
    compiler_params = _vmem_limit(weights, stream, outs, scratch)

    grid_spec = pl.GridSpec(
        grid=(S,),
        in_specs=[
            # clamp the index so the block stays in-range during fill/drain;
            # the kernel predicates on 0 <= t < T itself.
            pl.BlockSpec((1, B, G), lambda s: (jnp.minimum(s, T - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, 1, B), lambda s: (0, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, P), lambda s: (jnp.minimum(s, T - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, P, G), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, P, G), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Up, P), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, G), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, Up), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, Up), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, Up), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, 1, B, P), _wave_out_map(L, T),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, B, Up), _wave_out_map(L, T),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, B, P), _wave_out_map(L, T),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((L, 1, B, G), _wave_out_map(L, T),
                           memory_space=pltpu.VMEM)] if save_acts else []),
        scratch_shapes=[
            pltpu.VMEM((L, B, Up), jnp.float32),
            pltpu.VMEM((L, B, P), jnp.float32),
            pltpu.VMEM((L, B, P), jnp.float32),
        ],
    )
    kernel = lambda *refs: _wavefront_kernel(L, T, residual, save_acts,
                                             *refs)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((L, S, B, P), jnp.float32),
            jax.ShapeDtypeStruct((L, S, B, Up), jnp.float32),
            jax.ShapeDtypeStruct((L, S, B, P), jnp.float32),
        ] + ([jax.ShapeDtypeStruct((L, S, B, G), wh.dtype)] if save_acts
             else []),
        compiler_params=compiler_params,
    )(xw1, mask_lt, x, wx, wh, proj, bias, wi, wf, wo)
    return outs if save_acts else tuple(outs) + (None,)


def _wave_out_map(L, T):
    # Outputs are indexed by grid position s; layer k's row for timestep t
    # lives at [k, s] with t = s - k. The caller slices
    # taps[k, k:k+T] to recover time-major data.
    return lambda s: (0, s, 0, 0)

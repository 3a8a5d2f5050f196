"""res_lstm_l / plain L-layer stacks on the wavefront forward kernel +
composed zero-copy backward.

Forward: one wavefront kernel (rsrgan_tpu/ops/pallas_wavefront.py) runs
all L layers, emitting per-layer SKEWED tap/c/h/acts buffers. Backward:
the per-layer reverse kernel from pallas_lstm walked from the top layer
down, reading those buffers in place (row_offset index maps), with layer
inputs taken as lazy slices of the saved taps (fused into the dW_x
einsums) and gradients chained through d(tap_k) in plain JAX. Design
rationale and measurements: docs/KERNELS.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rsrgan_tpu.ops.pallas_lstm import (_round_up, lstm_layer_bwd,
                                        pad_gate_dim)
from rsrgan_tpu.ops.pallas_wavefront import (lstm_wavefront_fwd,
                                             make_wavefront_mask,
                                             wavefront_rows_per_step)


def _prep(params_list, D, forget_bias):
    """Stack + gate-pad per-layer parameters.

    params_list: per-layer dicts with 'kernel' [D+P, 4U], 'bias' [4U],
    'proj_kernel' [U, P], 'w_i_diag'/'w_f_diag'/'w_o_diag' [1, U].
    """
    L = len(params_list)
    U = params_list[0]["proj_kernel"].shape[0]
    P = params_list[0]["proj_kernel"].shape[1]
    Up = _round_up(U, 128)
    fb = jnp.zeros((4, U), jnp.float32).at[2].set(forget_bias).reshape(-1)

    wx = jnp.stack([pad_gate_dim(p["kernel"][:D], U, Up)
                    for p in params_list])          # [L, D, G]
    wh = jnp.stack([pad_gate_dim(p["kernel"][D:], U, Up)
                    for p in params_list])          # [L, P, G]
    bias = jnp.stack([pad_gate_dim((p["bias"] + fb)[None, :], U, Up)
                      for p in params_list])        # [L, 1, G]
    proj = jnp.stack([
        jnp.pad(p["proj_kernel"], ((0, Up - U), (0, 0))) if Up != U
        else p["proj_kernel"] for p in params_list])  # [L, Up, P]

    def peep(name):
        return jnp.stack([
            jnp.pad(p[name], ((0, 0), (0, Up - U))) if Up != U else p[name]
            for p in params_list])                  # [L, 1, Up]

    return wx, wh, bias, proj, peep("w_i_diag"), peep("w_f_diag"), \
        peep("w_o_diag"), Up, P


def res_lstm_l_stack(x_bm: jnp.ndarray, lengths, params_list,
                     forget_bias: float = 1.0,
                     compute_dtype=jnp.bfloat16,
                     save_acts: bool = True) -> jnp.ndarray:
    """[B, T, P] batch-major input -> final tap [B, T, P] (pre-dense).

    Equivalent to chaining L LstmCellP layers with res_lstm_l residuals.
    """
    return lstm_stack_wavefront(x_bm, lengths, params_list, True,
                                forget_bias, compute_dtype, save_acts)


def lstm_stack_wavefront(x_bm, lengths, params_list, residual,
                         forget_bias: float = 1.0,
                         compute_dtype=jnp.bfloat16,
                         save_acts: bool = True) -> jnp.ndarray:
    """Wavefront L-layer stack; residual=False gives MultiRNNCell wiring
    (StackedLstm parity). Requires every layer's input dim from layer 1
    on to equal num_proj (true for both wirings)."""
    B, T, P_in = x_bm.shape
    x = jnp.swapaxes(x_bm, 0, 1)  # [T, B, P]
    if lengths is None:
        lengths = jnp.full((B,), T, jnp.int32)
    mask = (jnp.arange(T)[:, None]
            < lengths[None, :].astype(jnp.int32)).astype(jnp.float32)
    flat = tuple(
        tuple(p[k] for k in ("kernel", "bias", "proj_kernel", "w_i_diag",
                             "w_f_diag", "w_o_diag")) for p in params_list)
    static = (float(forget_bias), jnp.dtype(compute_dtype).name,
              bool(residual))
    if save_acts:
        tap = _stack_vjp(static, x, mask, flat)
    else:
        # inference: skip the activation stream; NOT differentiable
        tap, _ = _stack_fwd_impl(static, x, mask, flat, save_acts=False)
    return jnp.swapaxes(tap, 0, 1)


def _as_dicts(flat_params):
    keys = ("kernel", "bias", "proj_kernel", "w_i_diag", "w_f_diag",
            "w_o_diag")
    return [dict(zip(keys, p)) for p in flat_params]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _stack_vjp(static, x, mask, flat_params):
    tap, _ = _stack_fwd_impl(static, x, mask, flat_params)
    return tap


def _stack_fwd_impl(static, x, mask, flat_params, save_acts=True):
    forget_bias, dtype_name, residual = static
    cdt = jnp.dtype(dtype_name)
    params_list = _as_dicts(flat_params)
    T, B, P_in = x.shape
    L = len(params_list)
    wx, wh, bias, proj, wi, wf, wo, Up, P = _prep(params_list, P_in,
                                                  forget_bias)
    # VMEM budget: 4 layers of f32 kernels exceed 16 MB — keep the big
    # matmul operands in compute_dtype (bf16 by default)
    wx = wx.astype(cdt)
    wh = wh.astype(cdt)
    proj = proj.astype(cdt)
    assert P == P_in, "res_lstm_l requires num_proj == input dim"

    # layer-1 projection hoisted outside the kernel; materialized in the
    # COMPUTE dtype — in bf16 mode this halves a [T, B, 4Up] HBM stream
    # (1.5 GB at B=256 T=500) at the cost of bf16-rounding layer 1's
    # pre-activation xw term, which layers 2..L already accept via their
    # bf16 in-kernel operands (f32 mode is bit-unchanged)
    xw1 = jnp.einsum("tbd,dg->tbg", x, wx[0],
                     preferred_element_type=jnp.float32).astype(cdt)
    R = wavefront_rows_per_step(T, B, 4 * Up, P, L,
                                jnp.dtype(cdt).itemsize, save_acts)
    mask_lt = make_wavefront_mask(mask, L, R)

    taps_s, c_s, h_s, a_s, R = lstm_wavefront_fwd(
        xw1, mask_lt, x, wx[1:], wh, proj, bias, wi, wf, wo,
        residual=residual, save_acts=save_acts, rows_per_step=R)
    # per-layer SKEWED outputs: layer k's timestep t lives at row k*R + t
    # of its own array; only the top tap is de-skewed here — the backward
    # reads the raw arrays in place (offset kernel index maps / fused
    # lazy slices), so no per-layer de-skew copies materialize (profiled:
    # they were ~15% of the training step)
    k0 = (L - 1) * R
    if not save_acts:
        return taps_s[L - 1][k0:k0 + T], None
    residuals = (x, mask, flat_params, tuple(taps_s), tuple(c_s),
                 tuple(h_s), tuple(a_s), R)
    return taps_s[L - 1][k0:k0 + T], residuals


def _stack_fwd(static, x, mask, flat_params):
    return _stack_fwd_impl(static, x, mask, flat_params)


def _stack_bwd(static, residuals, dtap_top):
    forget_bias, dtype_name, residual = static
    cdt = jnp.dtype(dtype_name)
    (x, mask, flat_params, taps_s, c_s, h_s, a_s, R) = residuals
    params_list = _as_dicts(flat_params)
    T, B, P = x.shape
    L = len(params_list)
    Up = c_s[0].shape[-1]
    wx, wh, bias, proj, wi, wf, wo, _, _ = _prep(params_list, P,
                                                 forget_bias)
    # match the forward's matmul dtype when recomputing xw_k, so the
    # backward's recomputed gate activations equal the forward's
    wx = wx.astype(cdt)
    wh = wh.astype(cdt)
    proj = proj.astype(cdt)
    mask_tb = mask  # [T, B]

    # layer inputs from the residual chain: in_0 = x, in_k = tap_{k-1}
    # (needed only for the dwx reductions; lazy slices of the skewed taps
    # fuse into those einsums)
    ins = [x] + [taps_s[k][k * R:k * R + T] for k in range(L - 1)]

    dtap = dtap_top
    dparams = []
    for k in reversed(range(L)):
        dout_k = dtap
        din_k = dtap if residual else jnp.zeros_like(dtap)
        mask3 = mask_tb[:, None, :]  # [T, 1, B]
        dxw, dwh, dproj, dbias, dwi, dwf, dwo = lstm_layer_bwd(
            T, B, Up, P, a_s[k], mask3, dout_k, c_s[k], h_s[k],
            wh[k], proj[k], wi[k], wf[k], wo[k], row_offset=k * R)
        din_k = din_k + jnp.einsum("tbg,dg->tbd", dxw.astype(cdt), wx[k],
                                   preferred_element_type=jnp.float32)
        dwx = jnp.einsum("tbd,tbg->dg", ins[k].astype(cdt),
                         dxw.astype(cdt),
                         preferred_element_type=jnp.float32)
        dparams.append((dwx, dwh, dproj, dbias, dwi, dwf, dwo))
        dtap = din_k  # = d(tap_{k-1}) for k>=1; = dx for k==0
    dx = dtap
    dparams = dparams[::-1]
    dmask = jnp.zeros_like(mask)

    # repack into the flat per-layer param tuples (unpad gate dims)
    U = params_list[0]["proj_kernel"].shape[0]

    def unpad_g(a):
        G4 = a.shape[-1]
        a4 = a.reshape(a.shape[:-1] + (4, G4 // 4))
        return a4[..., :U].reshape(a.shape[:-1] + (4 * U,))

    flat_grads = []
    for k in range(L):
        dwx, dwh, dproj, dbias, dwi, dwf, dwo = dparams[k]
        dkernel = jnp.concatenate([unpad_g(dwx), unpad_g(dwh)], axis=0)
        flat_grads.append((
            dkernel,
            unpad_g(dbias)[0],
            dproj[:U],
            dwi[:, :U],
            dwf[:, :U],
            dwo[:, :U],
        ))
    return dx, dmask, tuple(flat_grads)


_stack_vjp.defvjp(_stack_fwd, _stack_bwd)

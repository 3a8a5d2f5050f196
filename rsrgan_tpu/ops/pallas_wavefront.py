"""Wavefront-fused multi-layer LSTM forward for res_lstm_l / plain stacks.

The flagship generator runs four LSTM layers with layer residuals
(in_{k+1} = out_k + in_k, /root/reference/models/res_lstm_l.py:101-194).
Running them as four separate sequence kernels pays the per-grid-step
fixed cost four times and round-trips every layer's output through HBM.

This kernel runs ALL layers in one Mosaic program on a software pipeline:
layer k is skewed k time-blocks behind layer 0, so after a short fill the
layers advance in lockstep, with layer k's input block handed over from
layer k-1 through VMEM scratch (it was produced on the previous grid
step).

Two measured overheads shape the design (see BENCH_NOTES.md):

* per-grid-step pipeline bookkeeping is ~2 us on this chip — large next
  to the ~1-4 us of real cell math at B=16. Each grid step therefore
  processes R consecutive timesteps per layer (``rows_per_step``,
  auto-picked from the VMEM budget), amortizing the fixed cost R-fold.
* layer predication uses selects, not @pl.when control flow, so all
  layers' chains live in one basic block (measured a further 4-8%).

Coarsening also upgrades the in-kernel input projections: layer k's
entire R-row input block is known at step entry, so x@W_x runs as ONE
[R*B, P] x [P, 4Up] matmul instead of R matmuls at M=B (4x the MXU row
occupancy at B=16, R=4). Only the truly sequential recurrent and
projection matmuls remain at M=B.

Backward reuses the per-layer reverse kernel from pallas_lstm walked from
the top layer down (a fused reverse wavefront measured SLOWER — the
layer-to-layer gradient handoff needs a K=4Up matmul on the critical
path; see BENCH_NOTES.md "Negative result").

Used by ``lstm_impl='wavefront'`` via rsrgan_tpu/ops/wavefront_stack.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsrgan_tpu.ops.pallas_lstm import (_VMEM_CAP, _round_up,
                                        _vmem_limit, pad_gate_dim)


def _wavefront_kernel(L, TB, R, residual, save_acts, xw1_ref, mask_ref,
                      x_ref, wx_ref, wh_ref, proj_ref, bias_ref,
                      wi_ref, wf_ref, wo_ref, *rest):
    """One grid step: R consecutive timesteps for each of L skewed layers.

    Refs (B batch rows, G = 4*Up gate lanes, P proj lanes):
      xw1_ref   [R, B, G]     layer-1 input projection, time-block s
      mask_ref  [L, R, 1, B]  mask rows for block s-k, k = 0..L-1
      x_ref     [R, B, P]     raw input block s (feeds layer 1's tap)
      wx_ref    [L-1, P, G]   in-kernel input kernels for layers 2..L
      wh_ref    [L, P, G]     recurrent kernels
      proj_ref  [L, Up, P]    projections
      bias_ref  [L, 1, G]     biases (forget_bias folded)
      w*_ref    [L, 1, Up]    peepholes
    Outputs — PER-LAYER arrays (so each layer's backward reads its own
    buffer in place; an [L, ...]-packed output forced XLA to materialize
    per-layer slice copies), written at block position s (layer k's
    timestep t lives at row k*R + t):
      tap_refs[k]    [R, B, P]   tap_k(t) (post-mask)
      c_hist_refs[k] [R, B, Up]  post-mask cell state
      h_hist_refs[k] [R, B, P]   post-mask hidden state
      acts_refs[k]   [R, B, G]   gate activations [si, tj, sf, so]
    Scratch:
      c_scr [L, B, Up], h_scr [L, B, P] — recurrent states
      in_scr [L, R, B, P] — input-block handoff: slot k holds the block
      layer k consumes THIS grid step (written by layer k-1 on the
      previous one); slot 0 unused.
    """
    tap_refs = rest[:L]
    c_hist_refs = rest[L:2 * L]
    h_hist_refs = rest[2 * L:3 * L]
    if save_acts:
        acts_refs = rest[3 * L:4 * L]
        c_scr, h_scr, in_scr = rest[4 * L:]
    else:
        acts_refs = None
        c_scr, h_scr, in_scr = rest[3 * L:]
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        c_scr[...] = jnp.zeros_like(c_scr)
        h_scr[...] = jnp.zeros_like(h_scr)
        in_scr[...] = jnp.zeros_like(in_scr)

    wdt = wh_ref.dtype
    B = c_scr.shape[1]
    P = h_scr.shape[-1]

    # Phase 1: whole-block reads + batched input projections (independent
    # across layers; every input row is known at step entry).
    valid = [jnp.logical_and(s - k >= 0, s - k < TB) for k in range(L)]
    ins, xw_blk = [], []
    for k in range(L):
        if k == 0:
            in_blk = x_ref[...]                      # [R, B, P]
            xw = xw1_ref[...].reshape(R * B, -1)
        else:
            in_blk = in_scr[k]
            xw = jnp.dot(in_blk.reshape(R * B, P).astype(wdt),
                         wx_ref[k - 1],
                         preferred_element_type=jnp.float32)
        ins.append(in_blk)
        xw_blk.append(xw)

    # Phase 2: the sequential cell math, R rows x L layers in one basic
    # block (select-predicated) so the layers' chains interleave.
    c_st = [c_scr[k] for k in range(L)]
    h_st = [h_scr[k] for k in range(L)]
    for r in range(R):
        for k in reversed(range(L)):
            c_prev = c_st[k]
            h_prev = h_st[k]
            gates = (xw_blk[k][r * B:(r + 1) * B]
                     + jnp.dot(h_prev.astype(wdt), wh_ref[k],
                               preferred_element_type=jnp.float32)
                     + bias_ref[k, 0])
            Up = c_prev.shape[-1]
            i = gates[:, 0 * Up:1 * Up]
            j = gates[:, 1 * Up:2 * Up]
            f = gates[:, 2 * Up:3 * Up]
            o = gates[:, 3 * Up:4 * Up]
            si = jax.nn.sigmoid(i + wi_ref[k, 0] * c_prev)
            sf = jax.nn.sigmoid(f + wf_ref[k, 0] * c_prev)
            tj = jnp.tanh(j)
            c_new = sf * c_prev + si * tj
            so = jax.nn.sigmoid(o + wo_ref[k, 0] * c_new)
            m = so * jnp.tanh(c_new)
            h_new = jnp.dot(m.astype(wdt), proj_ref[k],
                            preferred_element_type=jnp.float32)

            live = jnp.logical_and(valid[k],
                                   mask_ref[k, r, 0][:, None] > 0)
            c_st[k] = jnp.where(live, c_new, c_prev)
            h_st[k] = jnp.where(live, h_new, h_prev)
            out = jnp.where(live, h_new, 0.0)
            # residual (res_lstm_l): tap_k = out_k + in_k; plain stack
            # (MultiRNNCell): the next layer consumes out_k directly
            tap = out + ins[k][r] if residual else out
            if k + 1 < L:
                # keep the slot stale outside the wavefront so layer k+1
                # reads zeros during its own fill steps
                in_scr[k + 1, r] = jnp.where(valid[k], tap,
                                             in_scr[k + 1, r])
            tap_refs[k][r] = tap
            c_hist_refs[k][r] = c_st[k]
            h_hist_refs[k][r] = h_st[k]
            if save_acts:
                acts_refs[k][r] = jnp.concatenate(
                    [si, tj, sf, so],
                    axis=1).astype(acts_refs[k].dtype)
    for k in range(L):
        c_scr[k] = c_st[k]
        h_scr[k] = h_st[k]


def wavefront_rows_per_step(T: int, B: int, G: int, P: int, L: int,
                            wbytes: int, save_acts: bool) -> int:
    """Largest R in (4, 2, 1) that divides T and keeps the estimated
    VMEM footprint (weights + R-scaled double-buffered streams) within
    the budget this chip is known to satisfy (BENCH_NOTES.md)."""
    Up = G // 4
    ps, pl_ = _round_up(P, 8), _round_up(P, 128)
    weights = ((L - 1) * ps * G + L * ps * G) * wbytes \
        + L * Up * pl_ * wbytes + L * (G + 3 * Up) * 4
    for R in (4, 2, 1):
        if T % R:
            continue
        stream = 2 * R * (B * G * 4 + B * pl_ * 4)
        outs = 2 * L * R * (2 * B * pl_ * 4 + B * Up * 4
                            + (B * G * wbytes if save_acts else 0))
        scratch = L * (B * Up + (2 + R) * B * pl_) * 4
        if (weights + stream + outs + scratch) * 1.5 <= _VMEM_CAP:
            return R
    return 1


def lstm_wavefront_fwd(xw1, mask_lt, x, wx, wh, proj, bias,
                       wi, wf, wo, residual=True, save_acts=True,
                       rows_per_step=None):
    """Launch the wavefront forward.

    xw1 [T, B, G] layer-1 projection; x [T, B, P] raw inputs;
    mask_lt [L, (TB+L-1)*R, 1, B] per-layer block-shifted masks
    (mask_lt[k, k*R + t, 0] = mask(t), zero elsewhere) — build with
    ``make_wavefront_mask``. Weight stacks: wx [L-1, P, G], wh [L, P, G],
    proj [L, Up, P], bias [L, 1, G], peepholes [L, 1, Up].

    Returns (taps, c_hist, h_hist, acts, R) where taps/c_hist/h_hist/
    acts are LISTS of L per-layer arrays [(TB+L-1)*R, B, *]: layer k's
    timestep t lives at row k*R + t (slice [k*R : k*R+T]). Per-layer
    output buffers let each layer's backward consume them in place.
    ``rows_per_step`` (R) must divide T; default auto-picks from the
    VMEM budget.
    """
    T, B, G = xw1.shape
    L = wh.shape[0]
    Up = G // 4
    P = proj.shape[2]
    wbytes = jnp.dtype(wh.dtype).itemsize
    R = rows_per_step or wavefront_rows_per_step(T, B, G, P, L, wbytes,
                                                 save_acts)
    assert T % R == 0, (T, R)
    TB = T // R
    S = TB + L - 1
    assert mask_lt.shape == (L, S * R, 1, B), mask_lt.shape

    ps, pl_ = _round_up(P, 8), _round_up(P, 128)
    weights = ((L - 1) * ps * G + L * ps * G) * wbytes \
        + L * Up * pl_ * wbytes + L * (G + 3 * Up) * 4
    stream = 2 * R * (B * G * 4 + B * pl_ * 4)
    outs = 2 * L * R * (2 * B * pl_ * 4 + B * Up * 4
                        + (B * G * wbytes if save_acts else 0))
    scratch = L * (B * Up + (2 + R) * B * pl_) * 4
    compiler_params = _vmem_limit(weights, stream, outs, scratch)

    blk = lambda s_: (jnp.minimum(s_, TB - 1), 0, 0)
    grid_spec = pl.GridSpec(
        grid=(S,),
        in_specs=[
            # clamp the block index in-range during fill/drain; the
            # kernel predicates on the wavefront validity itself.
            pl.BlockSpec((R, B, G), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, R, 1, B), lambda s_: (0, s_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, B, P), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, P, G), lambda s_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, P, G), lambda s_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, Up, P), lambda s_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, G), lambda s_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, Up), lambda s_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, Up), lambda s_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, Up), lambda s_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            [pl.BlockSpec((R, B, P), _wave_out_map, memory_space=pltpu.VMEM)
             for _ in range(L)]
            + [pl.BlockSpec((R, B, Up), _wave_out_map,
                            memory_space=pltpu.VMEM) for _ in range(L)]
            + [pl.BlockSpec((R, B, P), _wave_out_map,
                            memory_space=pltpu.VMEM) for _ in range(L)]
            + ([pl.BlockSpec((R, B, G), _wave_out_map,
                             memory_space=pltpu.VMEM) for _ in range(L)]
               if save_acts else [])),
        scratch_shapes=[
            pltpu.VMEM((L, B, Up), jnp.float32),
            pltpu.VMEM((L, B, P), jnp.float32),
            pltpu.VMEM((L, R, B, P), jnp.float32),
        ],
    )
    kernel = lambda *refs: _wavefront_kernel(L, TB, R, residual, save_acts,
                                             *refs)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            [jax.ShapeDtypeStruct((S * R, B, P), jnp.float32)
             for _ in range(L)]
            + [jax.ShapeDtypeStruct((S * R, B, Up), jnp.float32)
               for _ in range(L)]
            + [jax.ShapeDtypeStruct((S * R, B, P), jnp.float32)
               for _ in range(L)]
            + ([jax.ShapeDtypeStruct((S * R, B, G), wh.dtype)
                for _ in range(L)] if save_acts else [])),
        compiler_params=compiler_params,
    )(xw1, mask_lt, x, wx, wh, proj, bias, wi, wf, wo)
    taps, c_hist, h_hist = outs[:L], outs[L:2 * L], outs[2 * L:3 * L]
    acts = outs[3 * L:] if save_acts else None
    return taps, c_hist, h_hist, acts, R


def make_wavefront_mask(mask_tb, L: int, R: int) -> jnp.ndarray:
    """Block-shifted per-layer masks: [T, B] -> [L, (T//R+L-1)*R, 1, B]
    with mask_lt[k, k*R:k*R+T, 0] = mask (the dummy dim keeps the R
    rows out of the block's last-two-dims tiling constraint)."""
    T, B = mask_tb.shape
    S = T // R + L - 1
    mask_lt = jnp.zeros((L, S * R, 1, B), mask_tb.dtype)
    for k in range(L):
        mask_lt = mask_lt.at[k, k * R:k * R + T, 0].set(mask_tb)
    return mask_lt


def _wave_out_map(s_):
    # Outputs are indexed by grid position s (in R-row blocks); layer k's
    # timestep t lives at row k*R + t of its own array (de-skew slice
    # taps[k][k*R : k*R + T]).
    return (s_, 0, 0)

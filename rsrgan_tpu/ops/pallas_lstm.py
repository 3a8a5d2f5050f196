"""Fused Pallas TPU kernel for the peephole+projection LSTM recurrence.

The scan-based cell (rsrgan_tpu/ops/lstm.py) lowers to an XLA while-loop
that re-dispatches ~10 small ops per timestep; at T=500 that per-step
overhead dominates. This kernel runs the ENTIRE sequence inside one
Mosaic kernel: grid=(T,) executes sequentially on the core, the recurrent
state lives in VMEM scratch, weights stay VMEM-resident for the whole
sequence, and the per-step input projection xw_t streams in through the
automatic block pipeline.

Layout notes:
* gate dimension padded per-gate to a multiple of 128 lanes
  (U=760 -> 768) so gate slicing stays lane-aligned. Padded lanes carry
  zeros end-to-end (tanh(0)=0 keeps padded cell state at 0).
* the backward pass is a second kernel walking the grid in reverse
  (index maps b -> TB-1-b) over R-row blocks, reading the forward's SAVED
  gate activations (no recompute); weight gradients either stream out for
  full-sequence MXU reductions (small B) or accumulate into revisited
  output blocks in-kernel (large B) — see lstm_layer_bwd.
* length masking matches dynamic_rnn: masked steps freeze state, zero
  outputs, and contribute zero gradient.

Used by LstmCellP via ``lstm_seq`` (custom_vjp), selected with
``lstm_impl='pallas'``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Rows-per-step budget: a 71 MB vmem_limit compiled and ran on this chip
# (B=64 R=4 wavefront probe, tools/exp_vmem_probe.py), so usable VMEM is
# well above Mosaic's 16 MB default; 72 MB keeps headroom below that
# proven point.
_VMEM_CAP = 72 * 2**20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _vmem_limit(*block_bytes: int) -> "pltpu.CompilerParams":
    """CompilerParams raising Mosaic's default 16 MB scoped-VMEM budget
    when the kernel's block footprint needs it (physical VMEM is larger).
    Pass per-block byte counts; streams are already double-counted by the
    caller. Adds 50% headroom — Mosaic's actual buffering exceeds the
    nominal double-buffered estimate (measured 17.75M actual vs 12.8M
    estimated on the B=512 discriminator backward)."""
    total = int(sum(block_bytes) * 1.5)
    limit = max(16, total // 2**20 + 1) * 2**20
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def _lstm_block_bytes(B: int, Up: int, P: int, G: int, wbytes: int):
    """(weights, per-step stream in, per-step stream out-core) bytes for
    the single-layer kernels; P padded for lane/sublane placement."""
    ps, plane = _round_up(P, 8), _round_up(P, 128)
    weights = ps * G * wbytes + Up * plane * wbytes + (G + 3 * Up) * 4
    stream_in = B * G * 4 + B * plane * 4 + 2 * B * Up * 4 + B * plane * 4
    scratch = B * Up * 4 + B * plane * 4
    return weights, stream_in, scratch


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(save_acts, xw_ref, mask_ref, w_h_ref, proj_ref, bias_ref,
                w_i_ref, w_f_ref, w_o_ref,
                out_ref, c_hist_ref, h_hist_ref, *rest):
    if save_acts:
        acts_ref, c_scr, h_scr = rest
    else:
        acts_ref, (c_scr, h_scr) = None, rest
    t = pl.program_id(0)
    Up = c_scr.shape[1]

    @pl.when(t == 0)
    def _():
        c_scr[:] = jnp.zeros_like(c_scr)
        h_scr[:] = jnp.zeros_like(h_scr)

    c_prev = c_scr[:]
    h_prev = h_scr[:]

    wdt = w_h_ref.dtype  # f32 or bf16 (matmul inputs follow the weights)
    gates = (xw_ref[0]
             + jnp.dot(h_prev.astype(wdt), w_h_ref[:],
                       preferred_element_type=jnp.float32)
             + bias_ref[0])
    i = gates[:, 0 * Up:1 * Up]
    j = gates[:, 1 * Up:2 * Up]
    f = gates[:, 2 * Up:3 * Up]
    o = gates[:, 3 * Up:4 * Up]

    w_i = w_i_ref[0]
    w_f = w_f_ref[0]
    w_o = w_o_ref[0]
    # forget_bias is pre-folded into bias_ref's f quarter by the wrapper
    si = jax.nn.sigmoid(i + w_i * c_prev)
    sf = jax.nn.sigmoid(f + w_f * c_prev)
    tj = jnp.tanh(j)
    c_new = sf * c_prev + si * tj
    so = jax.nn.sigmoid(o + w_o * c_new)
    m = so * jnp.tanh(c_new)
    h_new = jnp.dot(m.astype(wdt), proj_ref[:],
                    preferred_element_type=jnp.float32)

    keep = mask_ref[0, 0][:, None]
    c_keep = jnp.where(keep > 0, c_new, c_prev)
    h_keep = jnp.where(keep > 0, h_new, h_prev)
    c_scr[:] = c_keep
    h_scr[:] = h_keep
    out_ref[0] = jnp.where(keep > 0, h_new, 0.0)
    c_hist_ref[0] = c_keep
    h_hist_ref[0] = h_keep
    if save_acts:
        # saved gate activations, packed in gate-slot order [si,tj,sf,so]:
        # the backward reads these instead of recomputing gates — removing
        # the reverse pass's largest matmul AND the outside xw-recompute
        # einsums. Inference forwards skip the stream (save_acts=False).
        acts_ref[0] = jnp.concatenate([si, tj, sf, so],
                                      axis=1).astype(acts_ref.dtype)


def _fwd_pallas(xw, mask, w_h, proj, bias, w_i, w_f, w_o,
                save_acts: bool = True):
    T, B, G = xw.shape  # G = 4*Up
    Up = G // 4
    P = proj.shape[1]
    grid_spec = pl.GridSpec(
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, G), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, B), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, G), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Up, P), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Up), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Up), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Up), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, P), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, Up), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, P), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((1, B, G), lambda t: (t, 0, 0),
                           memory_space=pltpu.VMEM)] if save_acts else []),
        scratch_shapes=[
            pltpu.VMEM((B, Up), jnp.float32),
            pltpu.VMEM((B, P), jnp.float32),
        ],
    )
    wb = jnp.dtype(w_h.dtype).itemsize
    weights, stream_in, scratch = _lstm_block_bytes(B, Up, P, G, wb)
    plane = _round_up(P, 128)
    out_core = 2 * B * plane * 4 + B * Up * 4 + (B * G * wb if save_acts
                                                 else 0)
    kernel = functools.partial(_fwd_kernel, save_acts)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((T, B, P), jnp.float32),
            jax.ShapeDtypeStruct((T, B, Up), jnp.float32),
            jax.ShapeDtypeStruct((T, B, P), jnp.float32),
        ] + ([jax.ShapeDtypeStruct((T, B, G), w_h.dtype)] if save_acts
             else []),
        compiler_params=_vmem_limit(weights, 2 * stream_in, 2 * out_core,
                                    scratch),
    )(xw, mask, w_h, proj, bias, w_i, w_f, w_o)
    return outs if save_acts else tuple(outs) + (None,)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(R, acts_ref, mask_ref, dout_ref, c_ref, cprev_ref,
                w_h_ref, proj_ref, w_i_ref, w_f_ref, w_o_ref,
                dxw_ref, m_ref, dh_ref,
                dc_scr, dh_scr):
    """Reverse-time step over an R-row block. Gate activations
    [si, tj, sf, so] stream in from the forward (saved, not recomputed —
    no gates matmul, no xw stream). Emits per-step dgates (dxw), masked m
    and masked dh_total; ALL weight-gradient reductions happen outside
    the kernel as single large MXU matmuls (lstm_layer_bwd) —
    accumulating them per step here costs two extra tiny matmuls on the
    critical path. R rows per grid step amortize the ~2 us per-step
    pipeline bookkeeping measured on this chip."""
    b = pl.program_id(0)          # 0..TB-1, walking the blocks in REVERSE
    TB = pl.num_programs(0)
    Up = dc_scr.shape[1]

    @pl.when(b == 0)
    def _():
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dh_scr[:] = jnp.zeros_like(dh_scr)

    wdt = w_h_ref.dtype
    w_i = w_i_ref[0]
    w_f = w_f_ref[0]
    w_o = w_o_ref[0]
    dc = dc_scr[:]
    dh = dh_scr[:]
    for r in reversed(range(R)):
        if r > 0:
            c_prev = c_ref[r - 1]
        else:
            # sequence position 0 lives in the last-visited block (b ==
            # TB-1); its c_prev is the zero initial state. cprev is a
            # single-row block (the row just before this block) — loading
            # a full R-row predecessor block was 4x wasted HBM traffic
            # for the one row actually read.
            c_prev = jnp.where(b == TB - 1, 0.0, cprev_ref[0])
        c_new = c_ref[r]          # post-mask == true c at valid steps
        keep = mask_ref[r, 0][:, None] > 0

        acts = acts_ref[r].astype(jnp.float32)
        si = acts[:, 0 * Up:1 * Up]
        tj = acts[:, 1 * Up:2 * Up]
        sf = acts[:, 2 * Up:3 * Up]
        so = acts[:, 3 * Up:4 * Up]
        tc = jnp.tanh(c_new)

        dh_total = dout_ref[r] + dh
        # h = m @ proj
        dm = jnp.dot(dh_total.astype(wdt), proj_ref[:].T,
                     preferred_element_type=jnp.float32)
        dm = jnp.where(keep, dm, 0.0)
        do_pre = dm * tc * so * (1.0 - so)
        dc_total = (dc * jnp.where(keep, 1.0, 0.0)
                    + dm * so * (1.0 - tc * tc) + do_pre * w_o)
        # NOTE: dc carried into a masked step passes through untouched.

        df_pre = dc_total * c_prev * sf * (1.0 - sf)
        di_pre = dc_total * tj * si * (1.0 - si)
        dj_pre = dc_total * si * (1.0 - tj * tj)
        dc_prev = (dc_total * sf + df_pre * w_f + di_pre * w_i)

        dgates = jnp.concatenate([di_pre, dj_pre, df_pre, do_pre], axis=1)
        dgates = jnp.where(keep, dgates, 0.0)

        dxw_ref[r] = dgates.astype(dxw_ref.dtype)
        m_ref[r] = jnp.where(keep, so * tc, 0.0).astype(m_ref.dtype)
        dh_ref[r] = jnp.where(keep, dh_total, 0.0).astype(dh_ref.dtype)

        dh_prev_new = jnp.dot(dgates.astype(wdt), w_h_ref[:].T,
                              preferred_element_type=jnp.float32)
        # masked step: carries pass through unchanged
        dc = jnp.where(keep, dc_prev, dc)
        dh = jnp.where(keep, dh_prev_new, dh)
    dc_scr[:] = dc
    dh_scr[:] = dh


def bwd_rows_per_step(T, B, Up, P, wbytes, grads_in_kernel=False) -> int:
    """Largest R in (4, 2, 1) dividing T whose double-buffered streams
    fit the VMEM budget this chip is known to satisfy."""
    G = 4 * Up
    weights, stream_in, scratch = _lstm_block_bytes(B, Up, P, G, wbytes)
    plane = _round_up(P, 128)
    out_core = B * G * 4 + B * Up * 4 + B * plane * 4
    if grads_in_kernel:
        ps = _round_up(P, 8)
        out_core += (ps * G + Up * plane + G + 3 * Up) * 4 // 2
        stream_in += B * plane * 4 + B * Up * 4   # h_cur + h_prev blocks
    for R in (4, 2, 1):
        if T % R:
            continue
        if (weights + scratch
                + 2 * R * (stream_in + out_core)) * 1.5 <= _VMEM_CAP:
            return R
    return 1


def _bwd_pallas(T, B, Up, P, acts, mask, dout, c_hist, w_h, proj,
                w_i, w_f, w_o, block_offset: int = 0):
    """``block_offset`` (in R-row blocks) lets acts/c_hist be views into a
    taller SKEWED array (the wavefront stack's raw outputs, where layer
    k's timestep t lives at row k*R + t) — the kernel reads them in place
    instead of materializing de-skewed copies."""
    G = 4 * Up
    R = bwd_rows_per_step(T, B, Up, P, jnp.dtype(w_h.dtype).itemsize)
    TB = T // R
    off = block_offset
    rev3 = lambda b: (TB - 1 - b, 0, 0)
    skew3 = lambda b: (off + TB - 1 - b, 0, 0)
    # previous-row history: a SINGLE-ROW block holding the row just
    # before this block's first row (only one prev row is ever read; the
    # first sequence position's zero state is handled in-kernel).
    prev_row3 = lambda b: (jnp.maximum((off + TB - 1 - b) * R - 1, 0),
                           0, 0)
    const2 = lambda b: (0, 0)
    grid_spec = pl.GridSpec(
        grid=(TB,),
        in_specs=[
            pl.BlockSpec((R, B, G), skew3, memory_space=pltpu.VMEM),  # acts
            pl.BlockSpec((R, 1, B), rev3, memory_space=pltpu.VMEM),   # mask
            pl.BlockSpec((R, B, P), rev3, memory_space=pltpu.VMEM),   # dout
            pl.BlockSpec((R, B, Up), skew3, memory_space=pltpu.VMEM),  # c_t
            pl.BlockSpec((1, B, Up), prev_row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((P, G), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Up, P), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Up), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Up), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Up), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, B, G), rev3, memory_space=pltpu.VMEM),   # dxw
            pl.BlockSpec((R, B, Up), rev3, memory_space=pltpu.VMEM),  # m
            pl.BlockSpec((R, B, P), rev3, memory_space=pltpu.VMEM),   # dh
        ],
        scratch_shapes=[
            pltpu.VMEM((B, Up), jnp.float32),
            pltpu.VMEM((B, P), jnp.float32),
        ],
    )
    wb = jnp.dtype(w_h.dtype).itemsize
    weights, stream_in, scratch = _lstm_block_bytes(B, Up, P, G, wb)
    plane = _round_up(P, 128)
    out_core = B * G * 4 + B * Up * 4 + B * plane * 4
    return pl.pallas_call(
        functools.partial(_bwd_kernel, R),
        grid_spec=grid_spec,
        out_shape=[
            # streams carry the compute dtype: every consumer is either a
            # bf16-operand matmul already or an f32-accumulated reduction
            jax.ShapeDtypeStruct((T, B, G), w_h.dtype),
            jax.ShapeDtypeStruct((T, B, Up), w_h.dtype),
            jax.ShapeDtypeStruct((T, B, P), w_h.dtype),
        ],
        compiler_params=_vmem_limit(weights, 2 * R * stream_in,
                                    2 * R * out_core, scratch),
    )(acts, mask, dout, c_hist, c_hist, w_h, proj,
      w_i, w_f, w_o)


# Batch threshold for the accumulator backward: at small B the in-kernel
# weight-grad matmuls sit on the latency-bound critical path (streamed
# variant measured faster: 309k vs 304k frames/s at B=16), while at larger
# B the streamed variant's extra HBM round-trips dominate (measured 21%
# step regression at B=64: dxw/m/dh re-reads are ~1.7 GB per layer-bwd).
_ACC_BWD_MIN_BATCH = 32


def _bwd_kernel_acc(R, acts_ref, mask_ref, dout_ref, c_ref, cprev_ref,
                    h_ref, hprev_ref, w_h_ref, proj_ref,
                    w_i_ref, w_f_ref, w_o_ref,
                    dxw_ref, dwh_ref, dproj_ref, dbias_ref,
                    dwi_ref, dwf_ref, dwo_ref,
                    dc_scr, dh_scr):
    """Reverse-time step over an R-row block with IN-KERNEL
    weight-gradient accumulation into revisited output blocks — the
    large-batch variant (see _ACC_BWD_MIN_BATCH). Gate activations
    stream in from the forward (saved, not recomputed); h(t-1) still
    streams in for the dW_h accumulation."""
    b = pl.program_id(0)          # 0..TB-1, walking the blocks in REVERSE
    TB = pl.num_programs(0)
    Up = dc_scr.shape[1]

    @pl.when(b == 0)
    def _():
        dc_scr[:] = jnp.zeros_like(dc_scr)
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dproj_ref[:] = jnp.zeros_like(dproj_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dwi_ref[:] = jnp.zeros_like(dwi_ref)
        dwf_ref[:] = jnp.zeros_like(dwf_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)

    wdt = w_h_ref.dtype
    w_i = w_i_ref[0]
    w_f = w_f_ref[0]
    w_o = w_o_ref[0]
    dc = dc_scr[:]
    dh = dh_scr[:]
    for r in reversed(range(R)):
        if r > 0:
            c_prev = c_ref[r - 1]
            h_prev = h_ref[r - 1]
        else:
            first = b == TB - 1   # sequence position 0: zero initial state
            # cprev/hprev are single-row blocks (see prev_row3): only one
            # predecessor row is ever read per grid step
            c_prev = jnp.where(first, 0.0, cprev_ref[0])
            h_prev = jnp.where(first, 0.0, hprev_ref[0])
        c_new = c_ref[r]          # post-mask == true c at valid steps
        keep = mask_ref[r, 0][:, None] > 0

        acts = acts_ref[r].astype(jnp.float32)
        si = acts[:, 0 * Up:1 * Up]
        tj = acts[:, 1 * Up:2 * Up]
        sf = acts[:, 2 * Up:3 * Up]
        so = acts[:, 3 * Up:4 * Up]
        tc = jnp.tanh(c_new)
        m = so * tc

        dh_total = dout_ref[r] + dh
        dm = jnp.dot(dh_total.astype(wdt), proj_ref[:].T,
                     preferred_element_type=jnp.float32)
        dm = jnp.where(keep, dm, 0.0)
        do_pre = dm * tc * so * (1.0 - so)
        dc_total = (dc * jnp.where(keep, 1.0, 0.0)
                    + dm * so * (1.0 - tc * tc) + do_pre * w_o)

        df_pre = dc_total * c_prev * sf * (1.0 - sf)
        di_pre = dc_total * tj * si * (1.0 - si)
        dj_pre = dc_total * si * (1.0 - tj * tj)
        dc_prev = (dc_total * sf + df_pre * w_f + di_pre * w_i)

        dgates = jnp.concatenate([di_pre, dj_pre, df_pre, do_pre], axis=1)
        dgates = jnp.where(keep, dgates, 0.0)

        m_masked = jnp.where(keep, m, 0.0)
        dh_masked = jnp.where(keep, dh_total, 0.0)

        dxw_ref[r] = dgates.astype(dxw_ref.dtype)
        dwh_ref[:] += jnp.dot(h_prev.T.astype(wdt), dgates.astype(wdt),
                              preferred_element_type=jnp.float32)
        dproj_ref[:] += jnp.dot(m_masked.T.astype(wdt),
                                dh_masked.astype(wdt),
                                preferred_element_type=jnp.float32)
        dbias_ref[0] += jnp.sum(dgates, axis=0)
        dwi_ref[0] += jnp.sum(di_pre * c_prev * jnp.where(keep, 1.0, 0.0),
                              axis=0)
        dwf_ref[0] += jnp.sum(df_pre * c_prev * jnp.where(keep, 1.0, 0.0),
                              axis=0)
        dwo_ref[0] += jnp.sum(do_pre * c_new * jnp.where(keep, 1.0, 0.0),
                              axis=0)

        dh_prev_new = jnp.dot(dgates.astype(wdt), w_h_ref[:].T,
                              preferred_element_type=jnp.float32)
        # masked step: carries pass through unchanged
        dc = jnp.where(keep, dc_prev, dc)
        dh = jnp.where(keep, dh_prev_new, dh)
    dc_scr[:] = dc
    dh_scr[:] = dh


def _bwd_pallas_acc(T, B, Up, P, acts, mask, dout, c_hist, h_hist, w_h,
                    proj, w_i, w_f, w_o, block_offset: int = 0):
    G = 4 * Up
    R = bwd_rows_per_step(T, B, Up, P, jnp.dtype(w_h.dtype).itemsize,
                          grads_in_kernel=True)
    TB = T // R
    off = block_offset
    rev3 = lambda b: (TB - 1 - b, 0, 0)
    skew3 = lambda b: (off + TB - 1 - b, 0, 0)
    # single-row predecessor blocks (only one prev row is read per grid
    # step — full R-row predecessor blocks were 4x wasted HBM traffic)
    prev_row3 = lambda b: (jnp.maximum((off + TB - 1 - b) * R - 1, 0),
                           0, 0)
    const2 = lambda b: (0, 0)
    grid_spec = pl.GridSpec(
        grid=(TB,),
        in_specs=[
            pl.BlockSpec((R, B, G), skew3, memory_space=pltpu.VMEM),  # acts
            pl.BlockSpec((R, 1, B), rev3, memory_space=pltpu.VMEM),   # mask
            pl.BlockSpec((R, B, P), rev3, memory_space=pltpu.VMEM),   # dout
            pl.BlockSpec((R, B, Up), skew3, memory_space=pltpu.VMEM),  # c_t
            pl.BlockSpec((1, B, Up), prev_row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((R, B, P), skew3, memory_space=pltpu.VMEM),  # h_t
            pl.BlockSpec((1, B, P), prev_row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((P, G), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((Up, P), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Up), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Up), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Up), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, B, G), rev3, memory_space=pltpu.VMEM),   # dxw
            pl.BlockSpec((P, G), const2, memory_space=pltpu.VMEM),    # dW_h
            pl.BlockSpec((Up, P), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Up), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Up), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Up), const2, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, Up), jnp.float32),
            pltpu.VMEM((B, P), jnp.float32),
        ],
    )
    wb = jnp.dtype(w_h.dtype).itemsize
    weights, stream_in, scratch = _lstm_block_bytes(B, Up, P, G, wb)
    ps, plane = _round_up(P, 8), _round_up(P, 128)
    out_core = B * G * 4                      # dxw stream
    grad_blocks = ps * G * 4 + Up * plane * 4 + (G + 3 * Up) * 4
    return pl.pallas_call(
        functools.partial(_bwd_kernel_acc, R),
        grid_spec=grid_spec,
        out_shape=[
            # dxw carries the compute dtype (consumers are bf16-operand
            # matmuls / f32-accumulated reductions); weight grads stay f32
            jax.ShapeDtypeStruct((T, B, G), w_h.dtype),
            jax.ShapeDtypeStruct((P, G), jnp.float32),
            jax.ShapeDtypeStruct((Up, P), jnp.float32),
            jax.ShapeDtypeStruct((1, G), jnp.float32),
            jax.ShapeDtypeStruct((1, Up), jnp.float32),
            jax.ShapeDtypeStruct((1, Up), jnp.float32),
            jax.ShapeDtypeStruct((1, Up), jnp.float32),
        ],
        compiler_params=_vmem_limit(weights, 2 * R * (stream_in
                                                      + B * plane * 4),
                                    2 * R * out_core, grad_blocks, scratch),
    )(acts, mask, dout, c_hist, c_hist, h_hist, h_hist, w_h, proj,
      w_i, w_f, w_o)


def lstm_weight_grads(Up, dxw, m_m, dh_m, c_hist, h_hist):
    """Weight-gradient reductions from the reverse kernel's streams, as
    full-sequence MXU matmuls. Returns (dwh, dproj, dbias, dwi, dwf, dwo)
    in padded gate dims.

    h_prev(t)/c_prev(t) pair with dgates(t); the t=0 terms have the zero
    initial state, so the reductions run over t = 1..T-1 with fused
    [1:]/[:-1] slices instead of materializing a zero-row-concatenated
    prev sequence (profiled: the concats were real HBM copies)."""
    f32 = jnp.float32
    dwh = jnp.einsum("tbp,tbg->pg", h_hist[:-1], dxw[1:],
                     preferred_element_type=f32)
    dproj = jnp.einsum("tbu,tbp->up", m_m, dh_m,
                       preferred_element_type=f32)
    dbias = jnp.sum(dxw, axis=(0, 1), dtype=f32)[None]
    di = dxw[..., 0 * Up:1 * Up]
    df = dxw[..., 2 * Up:3 * Up]
    do = dxw[..., 3 * Up:4 * Up]
    dwi = jnp.sum(di[1:] * c_hist[:-1], axis=(0, 1), dtype=f32)[None]
    dwf = jnp.sum(df[1:] * c_hist[:-1], axis=(0, 1), dtype=f32)[None]
    dwo = jnp.sum(do * c_hist, axis=(0, 1), dtype=f32)[None]
    return dwh, dproj, dbias, dwi, dwf, dwo


def lstm_layer_bwd(T, B, Up, P, acts, mask3, dout, c_hist, h_hist, w_h,
                   proj, w_i, w_f, w_o, row_offset: int = 0):
    """Single-layer backward from SAVED forward activations. Returns
    (dxw, dwh, dproj, dbias, dwi, dwf, dwo) in padded gate dims.

    Two variants, selected by batch size (_ACC_BWD_MIN_BATCH): small B
    streams dgates/m/dh out and reduces weight grads outside as
    full-sequence MXU matmuls; large B accumulates weight grads in-kernel
    to avoid the streams' HBM round-trips.

    ``row_offset``: acts/c_hist/h_hist may be the RAW skewed wavefront
    outputs (layer k's timestep t at row k*R_fwd + t) — when the offset
    aligns with this backward's own block size, the kernels read them in
    place via offset index maps and the outside reductions use lazy
    slices that fuse into their matmuls, so no de-skew copies
    materialize. A misaligned offset falls back to explicit slices.
    """
    acc = B >= _ACC_BWD_MIN_BATCH
    R = bwd_rows_per_step(T, B, Up, P, jnp.dtype(w_h.dtype).itemsize,
                          grads_in_kernel=acc)
    if row_offset % R:
        # de-skew explicitly; correctness over zero-copy
        acts = acts[row_offset:row_offset + T]
        c_hist = c_hist[row_offset:row_offset + T]
        h_hist = h_hist[row_offset:row_offset + T]
        row_offset = 0
    block_offset = row_offset // R
    if acc:
        return _bwd_pallas_acc(T, B, Up, P, acts, mask3, dout, c_hist,
                               h_hist, w_h, proj, w_i, w_f, w_o,
                               block_offset)
    dxw, m_m, dh_m = _bwd_pallas(T, B, Up, P, acts, mask3, dout, c_hist,
                                 w_h, proj, w_i, w_f, w_o, block_offset)
    lo = row_offset
    return (dxw,) + lstm_weight_grads(Up, dxw, m_m, dh_m,
                                      c_hist[lo:lo + T],
                                      h_hist[lo:lo + T])


# ---------------------------------------------------------------------------
# custom-vjp wrapper (padded-dim interface)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def lstm_seq_pallas(xw, mask, w_h, proj, bias, w_i, w_f, w_o):
    """Fused LSTM recurrence on PADDED gate dims.

    xw [T,B,4Up] f32 (input projection incl. nothing else), mask [T,B]
    f32 1/0, w_h [P,4Up], proj [Up,P], bias [1,4Up] (forget_bias already
    folded into the f quarter), peepholes [1,Up]. Returns out [T,B,P].
    """
    out, _, _, _ = _fwd_pallas(xw, mask, w_h, proj, bias, w_i, w_f, w_o)
    return out


def lstm_seq_pallas_infer(xw, mask, w_h, proj, bias, w_i, w_f, w_o):
    """Forward-only variant: no activation stream, NOT differentiable
    (jax will raise on grad — use lstm_seq_pallas in training paths)."""
    out, _, _, _ = _fwd_pallas(xw, mask, w_h, proj, bias, w_i, w_f, w_o,
                               save_acts=False)
    return out


def _lstm_seq_fwd(xw, mask, w_h, proj, bias, w_i, w_f, w_o):
    out, c_hist, h_hist, acts = _fwd_pallas(xw, mask, w_h, proj, bias,
                                            w_i, w_f, w_o)
    return out, (acts, mask, c_hist, h_hist, w_h, proj, w_i, w_f, w_o)


def _lstm_seq_bwd(res, dout):
    acts, mask, c_hist, h_hist, w_h, proj, w_i, w_f, w_o = res
    T, B, G = acts.shape
    Up = G // 4
    P = proj.shape[1]
    dxw, dwh, dproj, dbias, dwi, dwf, dwo = lstm_layer_bwd(
        T, B, Up, P, acts, mask, dout, c_hist, h_hist, w_h, proj,
        w_i, w_f, w_o)
    return (dxw.astype(jnp.float32), None, dwh.astype(w_h.dtype),
            dproj.astype(proj.dtype), dbias, dwi, dwf, dwo)


lstm_seq_pallas.defvjp(_lstm_seq_fwd, _lstm_seq_bwd)


# ---------------------------------------------------------------------------
# unpadded convenience API used by LstmCellP
# ---------------------------------------------------------------------------

def pad_gate_dim(a: jnp.ndarray, U: int, Up: int) -> jnp.ndarray:
    """Pad the last axis from 4*U to 4*Up, per gate."""
    if U == Up:
        return a
    shape = a.shape[:-1]
    a4 = a.reshape(shape + (4, U))
    a4 = jnp.pad(a4, [(0, 0)] * len(shape) + [(0, 0), (0, Up - U)])
    return a4.reshape(shape + (4 * Up,))


def lstm_seq(xw, lengths, w_h, proj, bias, w_i, w_f, w_o,
             forget_bias: float = 1.0, compute_dtype=jnp.float32,
             save_acts: bool = True):
    """Run the fused recurrence with natural (unpadded) shapes.

    xw [T,B,4U] f32, lengths [B] or None, w_h [P,4U], proj [U,P],
    bias [4U], peepholes [U]. Returns out [T,B,P] f32. ``compute_dtype``
    (f32/bf16) sets the matmul operand precision inside the kernel AND the
    storage dtype of the saved gate-activation stream the backward reads;
    recurrent state and gradient accumulation stay f32. (Under bf16 the
    saved activations carry bf16 rounding — the same error scale the old
    gate recomputation had from its bf16 matmul operands; guarded by a
    bf16-vs-f32 gradient sanity test.)
    """
    T, B, G = xw.shape
    U = G // 4
    P = proj.shape[1]
    Up = _round_up(U, 128)
    w_h = w_h.astype(compute_dtype)
    proj = proj.astype(compute_dtype)

    fb = jnp.zeros((4, U), xw.dtype).at[2].set(forget_bias).reshape(-1)
    bias_eff = pad_gate_dim((bias + fb)[None, :], U, Up)
    xw_p = pad_gate_dim(xw, U, Up)
    w_h_p = pad_gate_dim(w_h, U, Up)
    proj_p = jnp.pad(proj, ((0, Up - U), (0, 0))) if Up != U else proj
    peep = [jnp.pad(w[None, :], ((0, 0), (0, Up - U))) if Up != U
            else w[None, :] for w in (w_i, w_f, w_o)]
    if lengths is not None:
        mask = (jnp.arange(T)[:, None]
                < lengths[None, :].astype(jnp.int32)).astype(jnp.float32)
    else:
        mask = jnp.ones((T, B), jnp.float32)
    mask = mask[:, None, :]  # [T, 1, B] — satisfies TPU block tiling rules
    fn = lstm_seq_pallas if save_acts else lstm_seq_pallas_infer
    return fn(xw_p, mask, w_h_p, proj_p, bias_eff, *peep)

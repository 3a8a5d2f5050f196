"""EXPERIMENT: wavefront forward with merged (select-predicated) regions.

Hypothesis: the production kernel's per-layer @pl.when regions are
control-flow scheduling barriers, so the four layers' dependent chains
(dot -> elementwise -> dot) execute back-to-back (~6.2 us/grid step at
B=16). Replacing predication with selects puts all four chains in ONE
basic block, letting the VLIW scheduler interleave them.

Compares numerics + speed vs the production kernel on the TPU.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsrgan_tpu.ops.pallas_lstm import _vmem_limit, _round_up
from rsrgan_tpu.ops import pallas_wavefront as pw


def _merged_kernel(L, T, residual, save_acts, xw1_ref, mask_ref, x_ref,
                   wx_ref, wh_ref, proj_ref, bias_ref,
                   wi_ref, wf_ref, wo_ref,
                   tap_ref, c_hist_ref, h_hist_ref, *rest):
    if save_acts:
        acts_ref, c_scr, h_scr, in_scr = rest
    else:
        acts_ref, (c_scr, h_scr, in_scr) = None, rest
    s = pl.program_id(0)

    @pl.when(s == 0)
    def _():
        c_scr[...] = jnp.zeros_like(c_scr)
        h_scr[...] = jnp.zeros_like(h_scr)
        in_scr[...] = jnp.zeros_like(in_scr)

    wdt = wh_ref.dtype
    # Phase 1: all reads + gate matmuls (independent across layers).
    ins, gates_l, cprev_l, hprev_l, valid_l = [], [], [], [], []
    for k in range(L):
        t = s - k
        valid = jnp.logical_and(t >= 0, t < T)
        in_k = x_ref[0] if k == 0 else in_scr[k]
        xw_t = (xw1_ref[0] if k == 0 else
                jnp.dot(in_k.astype(wdt), wx_ref[k - 1],
                        preferred_element_type=jnp.float32))
        c_prev = c_scr[k]
        h_prev = h_scr[k]
        gates = (xw_t
                 + jnp.dot(h_prev.astype(wdt), wh_ref[k],
                           preferred_element_type=jnp.float32)
                 + bias_ref[k, 0])
        ins.append(in_k)
        gates_l.append(gates)
        cprev_l.append(c_prev)
        hprev_l.append(h_prev)
        valid_l.append(valid)

    # Phase 2: elementwise + proj + selects; handoffs written in reverse
    # layer order (k+1's slot read above before k overwrites it — reads
    # all happened in phase 1).
    for k in reversed(range(L)):
        gates = gates_l[k]
        c_prev = cprev_l[k]
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

        live = jnp.logical_and(valid_l[k],
                               mask_ref[k, 0, 0][:, None] > 0)
        c_keep = jnp.where(live, c_new, c_prev)
        h_keep = jnp.where(live, h_new, hprev_l[k])
        c_scr[k] = c_keep
        h_scr[k] = h_keep
        out = jnp.where(live, h_new, 0.0)
        tap = out + ins[k] if residual else out
        # keep the handoff stale during fill/drain so layer k+1 reads
        # zeros (matches @pl.when semantics: slot untouched when invalid)
        tap_hand = jnp.where(valid_l[k], tap, in_scr[k + 1] if k + 1 < L
                             else tap)
        if k + 1 < L:
            in_scr[k + 1] = tap_hand
        tap_ref[k, 0] = tap
        c_hist_ref[k, 0] = c_keep
        h_hist_ref[k, 0] = h_keep
        if save_acts:
            acts_ref[k, 0] = jnp.concatenate(
                [si, tj, sf, so], axis=1).astype(acts_ref.dtype)


def merged_fwd(xw1, mask_lt, x, wx, wh, proj, bias, wi, wf, wo,
               residual=True, save_acts=True):
    T, B, G = xw1.shape
    L = wh.shape[0]
    Up = G // 4
    P = proj.shape[2]
    S = T + L - 1
    wbytes = jnp.dtype(wh.dtype).itemsize
    ps, pl_ = _round_up(P, 8), _round_up(P, 128)
    weights = ((L - 1) * ps * G + L * ps * G) * wbytes \
        + L * Up * pl_ * wbytes + L * (G + 3 * Up) * 4
    stream = 2 * (B * G * 4 + B * pl_ * 4)
    outs = 2 * L * (2 * B * pl_ * 4 + B * Up * 4
                    + (B * G * wbytes if save_acts else 0))
    scratch = L * (B * Up + 2 * B * pl_) * 4
    compiler_params = _vmem_limit(weights, stream, outs, scratch)

    grid_spec = pl.GridSpec(
        grid=(S,),
        in_specs=[
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
            pl.BlockSpec((L, 1, B, P), lambda s: (0, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, B, Up), lambda s: (0, s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, B, P), lambda s: (0, s, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((L, 1, B, G), lambda s: (0, s, 0, 0),
                           memory_space=pltpu.VMEM)] if save_acts else []),
        scratch_shapes=[
            pltpu.VMEM((L, B, Up), jnp.float32),
            pltpu.VMEM((L, B, P), jnp.float32),
            pltpu.VMEM((L, B, P), jnp.float32),
        ],
    )
    kernel = lambda *refs: _merged_kernel(L, T, residual, save_acts, *refs)
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


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else "g"
    if cfg == "g":
        B, T, L, D, U, P, residual = 16, 500, 4, 257, 760, 257, True
    else:  # discriminator stack at the stacked-2B D-step width
        B, T, L, D, U, P, residual = 32, 500, 2, 40, 256, 40, False
    K = 20
    cache_dir = os.path.expanduser("~/.cache/rsrgan_xla")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    float(jnp.ones(()) + 1)

    rng = np.random.default_rng(0)
    from rsrgan_tpu.ops.wavefront_stack import _prep
    params = []
    for _ in range(L):
        params.append({
            "kernel": jnp.asarray(rng.normal(0, 0.05, (D + P, 4 * U)),
                                  jnp.float32),
            "bias": jnp.zeros((4 * U,), jnp.float32),
            "proj_kernel": jnp.asarray(rng.normal(0, 0.05, (U, P)),
                                       jnp.float32),
            "w_i_diag": jnp.asarray(rng.normal(0, 0.05, (1, U)), jnp.float32),
            "w_f_diag": jnp.asarray(rng.normal(0, 0.05, (1, U)), jnp.float32),
            "w_o_diag": jnp.asarray(rng.normal(0, 0.05, (1, U)), jnp.float32),
        })
        D = P

    wx, wh, bias, proj, wi, wf, wo, Up, _ = _prep(params, P, 1.0)
    wx = wx.astype(jnp.bfloat16)
    wh = wh.astype(jnp.bfloat16)
    proj = proj.astype(jnp.bfloat16)

    x = jnp.asarray(rng.normal(size=(T, B, P)), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(jnp.float32)
    S = T + L - 1
    mask_lt = jnp.zeros((L, S, 1, B), jnp.float32)
    for k in range(L):
        mask_lt = mask_lt.at[k, k:k + T, 0].set(mask)
    G = 4 * Up
    xw1 = jnp.einsum("tbd,dg->tbg", x, wx[0])

    def run(fwd_fn):
        def f():
            taps, _, _, _ = fwd_fn(xw1, mask_lt, x, wx[1:], wh, proj, bias,
                                   wi, wf, wo, residual=residual, save_acts=True)
            return taps[L - 1, L - 1:L - 1 + T]

        def body(c, _):
            c = c + 1e-30 * jnp.sum(f())
            return c, ()

        return jax.jit(
            lambda: jax.lax.scan(body, jnp.zeros(()), None, length=K)[0])

    base = run(pw.lstm_wavefront_fwd)
    merged = run(merged_fwd)

    # numeric parity first
    t0, _, _, _ = pw.lstm_wavefront_fwd(xw1, mask_lt, x, wx[1:], wh, proj,
                                        bias, wi, wf, wo, residual=residual)
    t1, _, _, _ = merged_fwd(xw1, mask_lt, x, wx[1:], wh, proj, bias,
                             wi, wf, wo, residual=residual)
    a = np.asarray(t0[L - 1, L - 1:L - 1 + T])
    b = np.asarray(t1[L - 1, L - 1:L - 1 + T])
    print("max |diff| =", np.abs(a - b).max(), flush=True)

    for name, fn in (("base", base), ("merged", merged)):
        float(fn())
        reps = []
        for _ in range(4):
            t0_ = time.perf_counter()
            float(fn())
            reps.append((time.perf_counter() - t0_) / K)
        print(f"{name:8s} {min(reps) * 1e3:7.3f} ms "
              f"({min(reps) / (T + L - 1) * 1e6:.2f} us/grid step)",
              flush=True)


if __name__ == "__main__":
    main()

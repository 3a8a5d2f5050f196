"""Probe the chip's usable scoped-VMEM by forcing the wavefront forward
to larger rows_per_step than the 40 MB budget allows, and time it.

Usage: python tools/exp_vmem_probe.py B R [T]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    B = int(sys.argv[1])
    R = int(sys.argv[2])
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    K = 10
    cache_dir = os.path.expanduser("~/.cache/rsrgan_xla")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    float(jnp.ones(()) + 1)

    from rsrgan_tpu.ops.pallas_wavefront import (lstm_wavefront_fwd,
                                                 make_wavefront_mask)
    from rsrgan_tpu.ops.wavefront_stack import _prep

    rng = np.random.default_rng(0)
    L, D, U, P = 4, 257, 760, 257
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
    mask = jnp.ones((T, B), jnp.float32)
    mask_lt = make_wavefront_mask(mask, L, R)
    xw1 = jnp.einsum("tbd,dg->tbg", x, wx[0])

    @jax.jit
    def g(xw1, mask_lt, x, wx, wh, proj, bias, wi, wf, wo):
        def f(c):
            taps = lstm_wavefront_fwd(xw1 + c, mask_lt, x, wx, wh, proj,
                                      bias, wi, wf, wo, residual=True,
                                      save_acts=True, rows_per_step=R)[0]
            return taps[L - 1][(L - 1) * R:(L - 1) * R + T]

        def body(c, _):
            return c + 1e-30 * jnp.sum(f(c)), ()

        return jax.lax.scan(body, jnp.zeros(()), None, length=K)[0]

    args = (xw1, mask_lt, x, wx[1:], wh, proj, bias, wi, wf, wo)
    float(g(*args))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(*args))
        reps.append((time.perf_counter() - t0) / K)
    dt = min(reps)
    print(f"B={B} R={R}: g_fwd {dt * 1e3:.3f} ms "
          f"({B * T / dt:,.0f} frames/s)", flush=True)


if __name__ == "__main__":
    main()

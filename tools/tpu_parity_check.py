"""Compiled-on-TPU parity check: scan vs pallas vs wavefront.

The pytest parity suite runs the kernels in interpreter mode (CPU); this
script re-verifies the COMPILED kernels on the real chip after kernel
changes (CLAUDE.md invariant). f32 compute must agree to float tolerance;
bf16 gradients to bf16 scale.

Usage: python tools/tpu_parity_check.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _arm_tunnel_watchdog() -> None:
    """Same workaround as bench.py: if the previous TPU process hasn't
    fully released the tunnel, the first device op hangs on a futex
    forever. Re-exec once after a cooldown if it doesn't come up."""
    import signal
    import time

    def on_alarm(signum, frame):
        if os.environ.get("RSRGAN_PARITY_RETRY"):
            raise TimeoutError("TPU tunnel did not come up after retry")
        os.environ["RSRGAN_PARITY_RETRY"] = "1"
        print("WARNING: TPU init stalled; retrying once after cooldown",
              flush=True)
        time.sleep(30)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(180)


def main() -> None:
    import signal

    _arm_tunnel_watchdog()
    cache_dir = os.path.expanduser("~/.cache/rsrgan_xla")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    float(jnp.ones(()) + 1)
    signal.alarm(0)

    from rsrgan_tpu.models.discriminators import LstmDiscriminator
    from rsrgan_tpu.models.recurrent import ResLstmGenerator

    rng = np.random.default_rng(0)
    T = 64   # divisible by 4 -> coarsened (R=4) grids

    def check(name, a, b, atol):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = np.abs(a - b).max()
        scale = max(np.abs(b).max(), 1e-6)
        ok = err <= atol * max(1.0, scale)
        print(f"{name:34s} max|diff|={err:.3e} scale={scale:.3e} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        return ok

    ok = True
    # Generator: scan vs wavefront, f32 compute (near-exact contract).
    # Two batch sizes exercise BOTH backward variants compiled:
    # B=4 -> streamed weight grads, B=32 -> in-kernel accumulator
    # (_ACC_BWD_MIN_BATCH).
    for B in (4, 32):
        x = jnp.asarray(rng.normal(size=(B, T, 257)), jnp.float32)
        lens = jnp.asarray(([T, T - 9, 30, 5] * B)[:B], jnp.int32)

        gens = {impl: ResLstmGenerator(output_dim=40, variant="l",
                                       lstm_impl=impl)
                for impl in ("scan", "pallas", "wavefront")}
        params = gens["scan"].init(jax.random.PRNGKey(0), x, lens)

        def loss(gen, lens=lens):
            return jax.jit(lambda p, xx: jnp.sum(
                jnp.sin(gen.apply(p, xx, lens, True))))

        o = {impl: jax.jit(lambda p, xx, g=g, lens=lens:
                           g.apply(p, xx, lens, True))(params, x)
             for impl, g in gens.items()}
        g_ = {impl: jax.grad(loss(g))(params, x)
              for impl, g in gens.items()}
        for impl in ("pallas", "wavefront"):
            ok &= check(f"G fwd {impl} vs scan (f32, B={B})",
                        o[impl], o["scan"], 1e-5)
            for (pa, pb) in zip(jax.tree.leaves(g_[impl]),
                                jax.tree.leaves(g_["scan"])):
                ok &= check(f"G grad {impl} vs scan (f32, B={B})",
                            pa, pb, 5e-4)
                break  # first leaf representative; full check below
            flat_a = np.concatenate([np.asarray(l).ravel()
                                     for l in jax.tree.leaves(g_[impl])])
            flat_b = np.concatenate([np.asarray(l).ravel()
                                     for l in jax.tree.leaves(g_["scan"])])
            ok &= check(f"G all-grads {impl} vs scan (B={B})",
                        flat_a, flat_b, 5e-4)
    B = 4
    x = jnp.asarray(rng.normal(size=(B, T, 257)), jnp.float32)
    lens = jnp.asarray([T, T - 9, 30, 5], jnp.int32)  # ends mid-block
    params = ResLstmGenerator(output_dim=40, variant="l",
                              lstm_impl="scan").init(
        jax.random.PRNGKey(0), x, lens)

    def loss(gen, lens=lens):
        return jax.jit(lambda p, xx: jnp.sum(
            jnp.sin(gen.apply(p, xx, lens, True))))

    g_scan = jax.grad(loss(ResLstmGenerator(output_dim=40, variant="l",
                                            lstm_impl="scan")))(params, x)

    # Discriminator stack (plain MultiRNNCell wiring), f32
    y = jnp.asarray(rng.normal(size=(B, T, 40)), jnp.float32)
    d_scan = LstmDiscriminator(lstm_impl="scan")
    d_wave = LstmDiscriminator(lstm_impl="wavefront")
    dp = d_scan.init(jax.random.PRNGKey(1), y, lens)
    ow = jax.jit(lambda p, yy: d_wave.apply(p, yy, lens, 0.0, True))(dp, y)
    os_ = jax.jit(lambda p, yy: d_scan.apply(p, yy, lens, 0.0, True))(dp, y)
    ok &= check("D fwd wavefront vs scan (f32)", ow, os_, 1e-5)

    # bf16 sanity: gradients within bf16 scale of the f32 scan
    gen_bf = ResLstmGenerator(output_dim=40, variant="l",
                              lstm_impl="wavefront",
                              compute_dtype=jnp.bfloat16)
    g_bf = jax.grad(loss(gen_bf))(params, x)
    flat_a = np.concatenate([np.asarray(l, np.float64).ravel()
                             for l in jax.tree.leaves(g_bf)])
    flat_b = np.concatenate([np.asarray(l, np.float64).ravel()
                             for l in jax.tree.leaves(g_scan)])
    scale = max(np.abs(flat_b).max(), 1e-3)
    err = np.abs(flat_a - flat_b).max()
    bf_ok = err <= 0.05 * scale
    print(f"{'G grads wavefront bf16 vs scan f32':34s} max|diff|={err:.3e} "
          f"scale={scale:.3e} {'OK' if bf_ok else 'FAIL'}", flush=True)
    ok &= bf_ok

    print("TPU PARITY " + ("PASSED" if ok else "FAILED"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

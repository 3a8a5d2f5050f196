"""Segment microbenchmarks for the flagship training step.

Times each sequential-recurrence segment of the 1D+2G GAN iteration in
isolation on the TPU (min-of-reps, K inner repetitions under one jit to
amortize the axon tunnel's ~20-27 ms dispatch latency):

  g_fwd      res_lstm_l 4-layer wavefront forward (save_acts)
  g_fwdbwd   forward + composed per-layer reverse
  d_fwd2b    discriminator 2-layer wavefront forward at 2B rows
             (the stacked D(real)/D(fake) pass of a D step)
  d_fwdbwd   D forward + backward at B rows (the G-step head)
  full       GanTrainer.train_step (1 D + 2 G)

Usage: python tools/kernel_bench.py [B] [T] [full]
(a literal "full" third arg skips the segment benches)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    K = 20



    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/rsrgan_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    float(jnp.ones(()) + 1)

    from rsrgan_tpu.ops.wavefront_stack import lstm_stack_wavefront

    rng = np.random.default_rng(0)

    def make_params(L, D, U, P, scale=0.05):
        out = []
        for _ in range(L):
            out.append({
                "kernel": jnp.asarray(
                    rng.normal(0, scale, (D + P, 4 * U)), jnp.float32),
                "bias": jnp.zeros((4 * U,), jnp.float32),
                "proj_kernel": jnp.asarray(
                    rng.normal(0, scale, (U, P)), jnp.float32),
                "w_i_diag": jnp.asarray(
                    rng.normal(0, scale, (1, U)), jnp.float32),
                "w_f_diag": jnp.asarray(
                    rng.normal(0, scale, (1, U)), jnp.float32),
                "w_o_diag": jnp.asarray(
                    rng.normal(0, scale, (1, U)), jnp.float32),
            })
            D = P
        return out

    g_params = make_params(4, 257, 760, 257)
    d_params = make_params(2, 40, 256, 40)

    def timeit(name, fn, *args):
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        reps = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(*args)
            float(jnp.sum(out[0] if isinstance(out, tuple) else out))
            reps.append((time.perf_counter() - t0) / K)
        print(f"{name:10s} {min(reps) * 1e3:8.3f} ms  "
              f"({B * T / min(reps):,.0f} frames/s)", flush=True)
        return min(reps)

    def chain(f):
        """K sequential applications under one jit; the carry feeds the
        next input so reps cannot overlap or be CSE'd away. The batch and
        params are jit ARGUMENTS, not closure captures — closed-over
        arrays become HLO constants, which the axon remote-compile
        endpoint rejects for large programs (HTTP 413, CLAUDE.md)."""

        def run(x0, *ps):
            def body(c, _):
                c = c + 1e-30 * jnp.sum(f(x0 + c, *ps))  # scalar dep chain
                return c, ()

            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=K)
            return c

        return jax.jit(run)

    xg = jnp.asarray(rng.normal(size=(B, T, 257)), jnp.float32)
    xd = jnp.asarray(rng.normal(size=(B, T, 40)), jnp.float32)
    xd2 = jnp.asarray(rng.normal(size=(2 * B, T, 40)), jnp.float32)
    lg = jnp.full((B,), T, jnp.int32)
    ld2 = jnp.full((2 * B,), T, jnp.int32)

    def g_fwd(x, ps):
        return lstm_stack_wavefront(x, lg, ps, residual=True,
                                    compute_dtype=jnp.bfloat16)

    def g_infer(x, ps):
        # decode path: no saved-activation stream (save_acts=False)
        return lstm_stack_wavefront(x, lg, ps, residual=True,
                                    compute_dtype=jnp.bfloat16,
                                    save_acts=False)

    def g_fwdbwd(x, ps):
        def loss(p):
            y = lstm_stack_wavefront(x, lg, p, residual=True,
                                     compute_dtype=jnp.bfloat16)
            return jnp.sum(y * y)
        g = jax.grad(loss)(ps)
        return g[0]["kernel"]

    def d_fwd2b(x, ps):
        return lstm_stack_wavefront(x, ld2, ps, residual=False,
                                    compute_dtype=jnp.bfloat16)

    def d_fwdbwd(x, ps):
        def loss(xin):
            y = lstm_stack_wavefront(xin, lg, ps, residual=False,
                                     compute_dtype=jnp.bfloat16)
            return jnp.sum(y * y)
        return jax.grad(loss)(x)

    if "full" not in sys.argv[3:]:   # arg "full" -> only the full step
        timeit("g_infer", chain(g_infer), xg, g_params)
        timeit("g_fwd", chain(g_fwd), xg, g_params)
        timeit("g_fwdbwd", chain(g_fwdbwd), xg, g_params)
        timeit("d_fwd2b", chain(d_fwd2b), xd2, d_params)
        timeit("d_fwdbwd", chain(d_fwdbwd), xd, d_params)

    # full training step (1 D + 2 G), same construction as bench.py
    from rsrgan_tpu.models import get_discriminator, get_generator
    from rsrgan_tpu.training import GanTrainer

    gen = get_generator("res_lstm_l", input_dim=257, output_dim=40,
                        compute_dtype=jnp.bfloat16, lstm_impl="wavefront")
    disc = get_discriminator("lstm", compute_dtype=jnp.bfloat16,
                             lstm_impl="wavefront")
    trainer = GanTrainer(gen, disc, output_dim=40, input_dim=257,
                         disc_updates=1, gen_updates=2, l2_scale=0.0,
                         max_grad_norm=15.0)
    y = jnp.asarray(rng.normal(size=(B, T, 40)), jnp.float32)
    hp = {"g_lr": jnp.float32(8e-5), "d_lr": jnp.float32(1e-3),
          "mse_lambda": jnp.float32(10.0),
          "disc_noise_std": jnp.float32(0.05),
          "d_real": jnp.float32(1.0), "d_fake": jnp.float32(0.0)}
    state = trainer.init_state(jax.random.PRNGKey(0), xg, lg)
    xs = jnp.broadcast_to(xg, (K,) + xg.shape)
    ys = jnp.broadcast_to(y, (K,) + y.shape)
    ls = jnp.broadcast_to(lg, (K,) + lg.shape)
    key = jax.random.PRNGKey(1)

    state, m = trainer.train_multi_step(state, xs, ys, ls, hp, key)
    float(m["g_loss"])
    reps = []
    for _ in range(4):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, m = trainer.train_multi_step(state, xs, ys, ls, hp, sub)
        float(m["g_loss"])
        reps.append((time.perf_counter() - t0) / K)
    print(f"{'full':10s} {min(reps) * 1e3:8.3f} ms  "
          f"({B * T / min(reps):,.0f} frames/s)", flush=True)


if __name__ == "__main__":
    main()

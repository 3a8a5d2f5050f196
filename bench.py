"""Benchmark: flagship GAN training throughput (frames/sec/chip).

Measures the full reference training iteration — 1 discriminator step + 2
generator steps on the same minibatch (run_gan_rnn_placeholder.sh:129-130)
— with the flagship architecture at full size (res_lstm_l G: 4x LSTM-760
proj-257, ~7.1M params; LSTM-D: 2x256 proj-40), batch 16 x 500 frames,
bf16 matmuls, on ONE chip.

vs_baseline: the reference publishes no numbers (BASELINE.md). The divisor
below is an engineering estimate of the TF1.4 reference's throughput on one
2017-class GPU for the same (1 D + 2 G) iteration: non-fused
tf.nn.dynamic_rnn LSTM stacks of this size ran ~3-6k frames/s/GPU
forward+backward; we use 5,000 frames/s/GPU. BASELINE.json's target is
>=10x this.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_EST_FRAMES_PER_SEC_PER_GPU = 5000.0

B, T = 16, 500
STEPS = 15


def _arm_tunnel_watchdog() -> None:
    """The axon TPU tunnel can hang a client forever if the previous
    process has not fully released the device. If the first trivial device
    op doesn't complete within the window, re-exec once with a cooldown."""
    import signal

    def on_alarm(signum, frame):
        if os.environ.get("RSRGAN_BENCH_RETRY"):
            raise TimeoutError("TPU tunnel did not come up after retry")
        os.environ["RSRGAN_BENCH_RETRY"] = "1"
        print("WARNING: TPU init stalled; retrying once after cooldown",
              flush=True)
        time.sleep(30)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(180)


def _train_loop_bench() -> dict:
    """Real-loop throughput measured through cli/train itself (round-3
    VERDICT #1): the number a user's training run experiences, not a
    synthetic fused loop. Synthetic single-bucket corpus (384 tr utts,
    T in [455,500) -> bucket edge 500), flagship gan_rnn config at B=16,
    2 iterations; reports iteration 2 (steady state: the device-resident
    tables are already up, compiles cached)."""
    import contextlib
    import shutil
    import tempfile

    from rsrgan_tpu.data.store import StoreWriter

    corpus = "/tmp/rsrgan_bench_loop"
    tr_list = os.path.join(corpus, "tr.list")
    if not os.path.isfile(tr_list):
        os.makedirs(corpus, exist_ok=True)
        rng = np.random.default_rng(11)
        for name, n in (("tr", 384), ("cv", 48)):
            path = os.path.join(corpus, f"{name}.rtu")
            with StoreWriter(path) as w:
                for i in range(n):
                    t = int(rng.integers(455, 500))
                    x = rng.normal(size=(t, 257)).astype(np.float32)
                    y = rng.normal(size=(t, 40)).astype(np.float32)
                    w.add(f"{name}{i:04d}", x, y)
            with open(os.path.join(corpus, f"{name}.list"), "w") as f:
                f.write(path + "\n")

    from rsrgan_tpu.cli import train as train_cli
    save_dir = tempfile.mkdtemp(prefix="rsrgan_bench_loop_")
    log_path = os.path.join(corpus, "train.log")
    try:
        with open(log_path, "w") as logf, \
                contextlib.redirect_stdout(logf):
            rc = train_cli.main([
                "--trainer=gan_rnn", "--g_type=res_lstm_l",
                f"--tr_list_file={tr_list}",
                f"--cv_list_file={os.path.join(corpus, 'cv.list')}",
                f"--save_dir={save_dir}",
                "--input_dim=257", "--output_dim=40", "--batch_size=16",
                "--g_learning_rate=8e-5", "--d_learning_rate=1e-3",
                "--disc_updates=1", "--gen_updates=2",
                "--init_mse_weight=10.0", "--init_disc_noise_std=0.05",
                "--min_epoches=1", "--max_epoches=2", "--end_improve=-1",
                "--tensorboard=false"])
        if rc != 0:
            raise RuntimeError(f"cli/train exited {rc} (log: {log_path})")
        with open(os.path.join(save_dir, "metrics_train.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        fps = float(rows[-1]["train_frames_per_sec"])
    finally:
        shutil.rmtree(save_dir, ignore_errors=True)
    return {
        "train_loop_frames_per_sec": round(fps, 1),
        "train_loop_note": "true frames/s through cli/train itself "
                           "(device-resident feed, flagship gan_rnn, "
                           "B=16, iteration 2 of 2)",
    }


def main() -> None:
    _arm_tunnel_watchdog()
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/rsrgan_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import signal

    float(jnp.ones(()) + 1)  # first device op: proves the tunnel is alive
    signal.alarm(0)

    from rsrgan_tpu.models import get_discriminator, get_generator
    from rsrgan_tpu.training import GanTrainer

    lstm_impl = os.environ.get("RSRGAN_LSTM_IMPL", "wavefront")
    gen = get_generator("res_lstm_l", input_dim=257, output_dim=40,
                        compute_dtype=jnp.bfloat16, lstm_impl=lstm_impl)
    disc = get_discriminator("lstm", compute_dtype=jnp.bfloat16,
                             lstm_impl=lstm_impl)
    trainer = GanTrainer(gen, disc, output_dim=40, input_dim=257,
                         disc_updates=1, gen_updates=2, l2_scale=0.0,
                         max_grad_norm=15.0)

    rng = np.random.default_rng(0)
    hp = {"g_lr": jnp.float32(8e-5), "d_lr": jnp.float32(1e-3),
          "mse_lambda": jnp.float32(10.0), "disc_noise_std": jnp.float32(0.05),
          "d_real": jnp.float32(1.0), "d_fake": jnp.float32(0.0)}

    def train_rate(batch, steps, num_reps, state=None):
        """min-of-reps per-step wall time for (1 D + 2 G) at ``batch``.

        Stacks ``steps`` same-bucket batches under ONE jit
        (train_multi_step) — the production training path; it amortizes
        the per-dispatch host/tunnel latency that dominates per-step host
        loops on this machine (~20-27 ms per synced call via the axon
        tunnel). Each rep is timed separately and the fastest wins: the
        tunnel occasionally stalls mid-run (observed 5x slowdowns), and
        min-of-reps measures the kernel, not the glitch.
        """
        x = jnp.asarray(rng.normal(size=(batch, T, 257)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(batch, T, 40)), jnp.float32)
        lengths = jnp.asarray(
            rng.integers(int(0.8 * T), T + 1, (batch,)), jnp.int32)
        if state is None:
            state = trainer.init_state(jax.random.PRNGKey(0), x, lengths)
        key = jax.random.PRNGKey(1)
        xs = jnp.broadcast_to(x, (steps,) + x.shape)
        ys = jnp.broadcast_to(y, (steps,) + y.shape)
        ls = jnp.broadcast_to(lengths, (steps,) + lengths.shape)
        # two warmups: one compiles, the second settles the tunnel
        # NOTE: sync via device_get — on the axon platform
        # jax.block_until_ready has been observed returning early.
        for _ in range(2):
            state, metrics = trainer.train_multi_step(state, xs, ys, ls,
                                                      hp, key)
            float(metrics["g_loss"])
        reps = []
        for _ in range(num_reps):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            state, metrics = trainer.train_multi_step(state, xs, ys, ls,
                                                      hp, sub)
            float(metrics["g_loss"])
            reps.append((time.perf_counter() - t0) / steps)
        true = float(np.sum(np.asarray(lengths)))
        return min(reps), true, state, x, lengths

    dt, true_frames, state, x, lengths = train_rate(B, STEPS, 8)

    # XLA's own count for the compiled step. NOTE: it attributes ZERO
    # flops to custom calls, i.e. every Pallas LSTM kernel -> a large
    # UNDERCOUNT here; reported for transparency, not used for MFU.
    xla_flops_per_step = None
    try:
        # .lower through the instance attribute loses the self binding on
        # jitted methods -> call it on the class with self explicit
        xs_l = jnp.broadcast_to(x, (STEPS,) + x.shape)
        ys_l = jnp.zeros((STEPS, B, T, 40), jnp.float32)
        ls_l = jnp.broadcast_to(lengths, (STEPS,) + lengths.shape)
        cost = (type(trainer).train_multi_step
                .lower(trainer, state, xs_l, ys_l, ls_l, hp,
                       jax.random.PRNGKey(2)).compile()
                .cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        xla_flops_per_step = float(cost["flops"]) / STEPS
    except Exception:
        pass  # cost_analysis availability varies by backend/version

    # Analytic model FLOPs, matmul-dominated: 2*params per frame forward,
    # 3x for fwd+bwd. Per training iteration (1 D step + 2 G steps,
    # gan.py): D step = G fwd (1g) + D fwd+bwd (3d); each G step =
    # G fwd+bwd (3g) + D fwd + D input-bwd (2d).
    n_g = sum(int(np.prod(p.shape))
              for p in jax.tree.leaves(state.g.params))
    n_d = sum(int(np.prod(p.shape))
              for p in jax.tree.leaves(state.d.params))
    g_fwd, d_fwd = 2.0 * n_g, 2.0 * n_d
    per_frame = (1 * (g_fwd + 3 * d_fwd)
                 + 2 * (3 * g_fwd + 2 * d_fwd))
    model_flops_per_step = per_frame * true_frames

    PEAK_BF16_FLOPS = 394e12 / 2  # v5e: 394 TOPS int8 -> 197 TFLOP/s bf16
    out = {
        "metric": "gan_train_frames_per_sec_per_chip",
        "value": round(B * T / dt, 1),
        "unit": "padded frames/s/chip (1 D + 2 G steps per batch, "
                "B=16 T=500)",
        "vs_baseline": round(
            (B * T / dt) / BASELINE_EST_FRAMES_PER_SEC_PER_GPU, 2),
        "vs_baseline_note": "divisor is an ENGINEERING ESTIMATE (5000 "
                            "frames/s/GPU for the TF1.4 reference; it "
                            "publishes no numbers, BASELINE.md)",
        "true_frames_per_sec": round(true_frames / dt, 1),
        "step_wall_ms": round(dt * 1e3, 3),
        "model_tflops_per_sec": round(model_flops_per_step / dt / 1e12, 2),
        "mfu": round(model_flops_per_step / dt / PEAK_BF16_FLOPS, 4),
        "mfu_note": "analytic model FLOPs (2*params/frame fwd, 3x "
                    "fwd+bwd, 7g+7d per iteration) over TRUE frames / "
                    "197 TFLOP/s bf16 peak",
    }
    if xla_flops_per_step is not None:
        out["xla_counted_tflops_per_sec"] = round(
            xla_flops_per_step / dt / 1e12, 2)
        out["xla_flops_note"] = ("cost_analysis excludes custom-call "
                                 "(Pallas) kernels - undercount")

    # B=256: the batch that fills the chip (round-2 VERDICT weak #3 —
    # this number belongs in the driver-captured JSON, not just prose)
    B_BIG, STEPS_BIG = 256, 4
    dt_big, true_big, _, _, _ = train_rate(B_BIG, STEPS_BIG, 4)
    out["b256_frames_per_sec"] = round(true_big / dt_big, 1)
    out["b256_padded_frames_per_sec"] = round(B_BIG * T / dt_big, 1)
    out["b256_step_wall_ms"] = round(dt_big * 1e3, 3)
    out["b256_mfu"] = round(
        per_frame * true_big / dt_big / PEAK_BF16_FLOPS, 4)

    # decode/enhancement throughput (generator forward only, the
    # batch-decode path of cli/train.py --decode --decode_batch_size)
    B_DEC = 64
    x_dec = jnp.asarray(rng.normal(size=(B_DEC, T, 257)), jnp.float32)
    l_dec = jnp.asarray(
        rng.integers(int(0.8 * T), T + 1, (B_DEC,)), jnp.int32)
    for _ in range(2):  # compile + settle
        y_dec = trainer.infer_step(state.g.params, x_dec, l_dec)
        float(y_dec[0, 0, 0])
    dec_reps = []
    for _ in range(6):
        t0 = time.perf_counter()
        y_dec = trainer.infer_step(state.g.params, x_dec, l_dec)
        float(y_dec[0, 0, 0])
        dec_reps.append(time.perf_counter() - t0)
    dec_true = float(np.sum(np.asarray(l_dec)))
    out["decode_frames_per_sec"] = round(dec_true / min(dec_reps), 1)
    out["decode_batch"] = B_DEC

    # the loop a user experiences, via the actual CLI (never crash the
    # driver-facing JSON over it)
    try:
        out.update(_train_loop_bench())
        out["train_loop_vs_step"] = round(
            out["train_loop_frames_per_sec"] / out["true_frames_per_sec"],
            3)
    except Exception as e:  # noqa: BLE001 - report, don't lose the bench
        out["train_loop_error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()

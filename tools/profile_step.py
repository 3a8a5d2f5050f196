"""Capture an XLA profiler trace of the flagship training step and print
the device-time breakdown, parsed in-process with jax.profiler.ProfileData
(no TensorBoard needed — this host's 1 CPU core makes the UI impractical).

Usage: python tools/profile_step.py [B] [T]
       python tools/profile_step.py --xplane PATH [STEPS]
         (re-analyze a saved trace, no device run; STEPS defaults to 10)
"""

import collections
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--xplane":
        report(sys.argv[2],
               steps=int(sys.argv[3]) if len(sys.argv) > 3 else 10)
        return
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    STEPS = 10

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.expanduser("~/.cache/rsrgan_xla")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    float(jnp.ones(()) + 1)

    from rsrgan_tpu.models import get_discriminator, get_generator
    from rsrgan_tpu.training import GanTrainer

    gen = get_generator("res_lstm_l", input_dim=257, output_dim=40,
                        compute_dtype=jnp.bfloat16, lstm_impl="wavefront")
    disc = get_discriminator("lstm", compute_dtype=jnp.bfloat16,
                             lstm_impl="wavefront")
    trainer = GanTrainer(gen, disc, output_dim=40, input_dim=257,
                         disc_updates=1, gen_updates=2, l2_scale=0.0,
                         max_grad_norm=15.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, 257)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(B, T, 40)), jnp.float32)
    lengths = jnp.asarray(rng.integers(int(0.8 * T), T + 1, (B,)), jnp.int32)
    hp = {"g_lr": jnp.float32(8e-5), "d_lr": jnp.float32(1e-3),
          "mse_lambda": jnp.float32(10.0),
          "disc_noise_std": jnp.float32(0.05),
          "d_real": jnp.float32(1.0), "d_fake": jnp.float32(0.0)}
    state = trainer.init_state(jax.random.PRNGKey(0), x, lengths)
    xs = jnp.broadcast_to(x, (STEPS,) + x.shape)
    ys = jnp.broadcast_to(y, (STEPS,) + y.shape)
    ls = jnp.broadcast_to(lengths, (STEPS,) + lengths.shape)
    key = jax.random.PRNGKey(1)

    state, m = trainer.train_multi_step(state, xs, ys, ls, hp, key)
    float(m["g_loss"])  # compile + warm

    outdir = "/tmp/rsrgan_profile"
    os.makedirs(outdir, exist_ok=True)
    jax.profiler.start_trace(outdir)
    state, m = trainer.train_multi_step(state, xs, ys, ls, hp, key)
    float(m["g_loss"])
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(outdir + "/**/*.xplane.pb", recursive=True),
                   key=os.path.getmtime)
    assert paths, f"no xplane.pb under {outdir}"
    report(paths[-1], STEPS)


def report(xplane_path: str, steps: int) -> None:
    import jax

    STEPS = steps
    data = jax.profiler.ProfileData.from_file(xplane_path)

    for plane in data.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        print(f"=== plane: {plane.name} ===")
        per_op = collections.Counter()
        calls = collections.Counter()
        total = 0
        for line in plane.lines:
            if "XLA Op" in line.name or "Ops" in line.name:
                pass  # op-level lines preferred but names vary by backend
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns
                per_op[(line.name, name)] += dur
                calls[(line.name, name)] += 1
        # report per line, top events
        by_line = collections.defaultdict(collections.Counter)
        for (ln, name), dur in per_op.items():
            by_line[ln][name] += dur
        for ln, ctr in by_line.items():
            line_total = sum(ctr.values())
            print(f"-- line '{ln}': {line_total / 1e6:.3f} ms total")
            for name, dur in ctr.most_common(60):
                n = calls[(ln, name)]
                print(f"   {dur / 1e6:9.3f} ms  x{n:5d}  {name[:90]}")
        total += sum(ctr.values())

        # category rollup over the op-level line (excluding the outer
        # %while wrapper, which nests and double-counts everything):
        # per-step ms by kind, to separate kernel time from glue
        def categorize(name: str) -> str:
            if "cell_" in name or "wavefront" in name or \
                    "custom-call" in name:
                return "pallas kernels"
            if "transpose" in name:
                return "transpose/layout (wgrad operands)"
            if "convolution" in name:
                return "XLA matmuls (dense/proj/wgrad)"
            if name.startswith("%copy") or "bitcast" in name or \
                    "dynamic-slice" in name or "dynamic-update" in name:
                return "copies/slices"
            if "reduce" in name:
                return "reductions (loss/clip/EMA)"
            if "jvp" in name:
                return "model fused matmuls"
            return "other elementwise/glue"

        for ln, ctr in by_line.items():
            # async copy-starts overlap compute; their durations are not
            # additive step time, so only the synchronous op line rolls up
            if "XLA Ops" not in ln or "Async" in ln:
                continue
            cats = collections.Counter()
            for name, dur in ctr.items():
                if name.startswith("%while"):
                    continue
                cats[categorize(name)] += dur
            cat_total = sum(cats.values())
            if not cat_total:
                continue
            print(f"-- per-step category rollup ({STEPS} steps, "
                  f"{cat_total / 1e6 / STEPS:.2f} ms/step inside ops):")
            for cat, dur in cats.most_common():
                print(f"   {dur / 1e6 / STEPS:8.3f} ms/step "
                      f"({100 * dur / cat_total:4.1f}%)  {cat}")


if __name__ == "__main__":
    main()

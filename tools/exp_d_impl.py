"""Re-measure the discriminator backend choice after grid coarsening:
per-layer pallas kernels vs the fused wavefront stack, at the shapes the
trainer uses (2B-row stacked D-step forward; B-row G-step fwd+bwd).

Usage: python tools/exp_d_impl.py [B] [T]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    K = 20
    cache_dir = os.path.expanduser("~/.cache/rsrgan_xla")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    float(jnp.ones(()) + 1)

    from rsrgan_tpu.models.discriminators import LstmDiscriminator

    rng = np.random.default_rng(0)
    y2 = jnp.asarray(rng.normal(size=(2 * B, T, 40)), jnp.float32)
    y1 = jnp.asarray(rng.normal(size=(B, T, 40)), jnp.float32)
    l2 = jnp.full((2 * B,), T, jnp.int32)
    l1 = jnp.full((B,), T, jnp.int32)

    # force the named backend regardless of batch (this tool MEASURES the
    # crossover that LstmDiscriminator's row-adaptive default encodes)
    LstmDiscriminator.WAVEFRONT_MIN_ROWS = 0
    mods = {impl: LstmDiscriminator(compute_dtype=jnp.bfloat16,
                                    lstm_impl=impl)
            for impl in ("pallas", "wavefront")}
    params = mods["pallas"].init(jax.random.PRNGKey(0), y1, l1)

    def timeit(name, fn, *args):
        jfn = jax.jit(fn)
        out = jfn(*args)
        float(jnp.sum(out))
        reps = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(jnp.sum(jfn(*args)))
            reps.append((time.perf_counter() - t0) / K)
        print(f"{name:22s} {min(reps) * 1e3:7.3f} ms", flush=True)

    for impl, mod in mods.items():
        def fwd2b(p, y):
            def body(c, _):
                o = mod.apply(p, y + c, l2, 0.0, True)
                return c + 1e-30 * jnp.sum(o), ()
            return jax.lax.scan(body, jnp.zeros(()), None, length=K)[0]

        def fwdbwd(p, y):
            def one(yy):
                return jnp.sum(mod.apply(p, yy, l1, 0.0, True) ** 2)

            def body(c, _):
                return c + 1e-30 * jnp.sum(jax.grad(one)(y + c)), ()
            return jax.lax.scan(body, jnp.zeros(()), None, length=K)[0]

        timeit(f"{impl} fwd 2B", fwd2b, params, y2)
        timeit(f"{impl} fwd+bwd B", fwdbwd, params, y1)


if __name__ == "__main__":
    main()

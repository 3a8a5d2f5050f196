"""Wavefront multi-layer kernel parity vs the scan res_lstm_l stack
(interpreter mode; compiled parity verified on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from rsrgan_tpu.models.recurrent import ResLstmGenerator

B, T, D, OUT = 3, 17, 9, 4


def test_wavefront_matches_scan(rng):
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lens = jnp.array([T, 11, 5], jnp.int32)
    scan_gen = ResLstmGenerator(output_dim=OUT, variant="l", cell_size=13,
                                lstm_impl="scan")
    wave_gen = ResLstmGenerator(output_dim=OUT, variant="l", cell_size=13,
                                lstm_impl="wavefront")
    params = scan_gen.init(jax.random.PRNGKey(0), x, lens)

    def loss(gen):
        return lambda p, x: jnp.sum(jnp.sin(gen.apply(p, x, lens)))

    with pltpu.force_tpu_interpret_mode():
        # identical parameter tree -> checkpoints interchange
        pw = wave_gen.init(jax.random.PRNGKey(0), x, lens)
        assert (jax.tree_util.tree_structure(pw)
                == jax.tree_util.tree_structure(params))
        o_wave = wave_gen.apply(params, x, lens)
        g_wave = jax.grad(loss(wave_gen), argnums=(0, 1))(params, x)
    o_scan = scan_gen.apply(params, x, lens)
    g_scan = jax.grad(loss(scan_gen), argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(o_wave), np.asarray(o_scan),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(g_wave), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

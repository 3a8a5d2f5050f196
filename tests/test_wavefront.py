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
        # train=True: the inference forward (train=False) intentionally
        # skips the saved-activation stream and is not differentiable
        return lambda p, x: jnp.sum(jnp.sin(gen.apply(p, x, lens, True)))

    with pltpu.force_tpu_interpret_mode():
        # identical parameter tree -> checkpoints interchange
        pw = wave_gen.init(jax.random.PRNGKey(0), x, lens)
        assert (jax.tree_util.tree_structure(pw)
                == jax.tree_util.tree_structure(params))
        o_wave = wave_gen.apply(params, x, lens)       # no-acts kernel
        o_wave_tr = wave_gen.apply(params, x, lens, True)
        g_wave = jax.grad(loss(wave_gen), argnums=(0, 1))(params, x)
    o_scan = scan_gen.apply(params, x, lens)
    g_scan = jax.grad(loss(scan_gen), argnums=(0, 1))(params, x)
    # inference (save_acts=False) and training forwards agree
    np.testing.assert_allclose(np.asarray(o_wave), np.asarray(o_wave_tr),
                               atol=1e-6)

    np.testing.assert_allclose(np.asarray(o_wave), np.asarray(o_scan),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(g_wave), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_plain_stack_wavefront_matches_scan(rng):
    """Non-residual (MultiRNNCell) wavefront wiring via the discriminator."""
    from rsrgan_tpu.models.discriminators import LstmDiscriminator

    B2, T2, P2 = 3, 15, 6
    y = jnp.asarray(rng.normal(size=(B2, T2, P2)), jnp.float32)
    lens = jnp.array([T2, 9, 4], jnp.int32)
    d_scan = LstmDiscriminator(cell_size=10, num_projection=P2,
                               lstm_impl="scan")
    d_wave = LstmDiscriminator(cell_size=10, num_projection=P2,
                               lstm_impl="wavefront")
    params = d_scan.init(jax.random.PRNGKey(0), y, lens)

    def loss(d):
        return lambda p, y: jnp.sum(jnp.tanh(
            d.apply(p, y, lens, 0.0, True)))

    with pltpu.force_tpu_interpret_mode():
        ow = d_wave.apply(params, y, lens)
        gw = jax.grad(loss(d_wave), argnums=(0, 1))(params, y)
    os_ = d_scan.apply(params, y, lens)
    gs = jax.grad(loss(d_scan), argnums=(0, 1))(params, y)
    np.testing.assert_allclose(np.asarray(ow), np.asarray(os_), atol=1e-5)
    for a, b in zip(jax.tree.leaves(gw), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_odd_layer_stack(rng):
    """L=3 exercises the non-flagship layer count end to end."""
    from rsrgan_tpu.ops.lstm import StackedLstm

    B3, T3, P3 = 2, 13, 5
    x = jnp.asarray(rng.normal(size=(B3, T3, P3)), jnp.float32)
    lens = jnp.array([T3, 7], jnp.int32)
    scan_m = StackedLstm(num_layers=3, num_units=8, num_proj=P3,
                         lstm_impl="scan")
    wave_m = StackedLstm(num_layers=3, num_units=8, num_proj=P3,
                         lstm_impl="wavefront")
    params = scan_m.init(jax.random.PRNGKey(0), x, lens)

    def loss(m):
        return lambda p, x: jnp.sum(jnp.cos(m.apply(p, x, lens, True)))

    with pltpu.force_tpu_interpret_mode():
        ow = wave_m.apply(params, x, lens)
        gw = jax.grad(loss(wave_m), argnums=(0, 1))(params, x)
    os_ = scan_m.apply(params, x, lens)
    gs = jax.grad(loss(scan_m), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(ow), np.asarray(os_), atol=1e-5)
    for a, b in zip(jax.tree.leaves(gw), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_wavefront_coarsened_rows_match_scan(rng):
    """T divisible by 4 selects the R=4 coarsened grid (R consecutive
    timesteps per grid step); parity must hold incl. ragged lengths that
    end mid-block."""
    T4 = 16
    x = jnp.asarray(rng.normal(size=(B, T4, D)), jnp.float32)
    lens = jnp.array([T4, 11, 5], jnp.int32)  # ends at rows 3, 2, 0 of blocks
    scan_gen = ResLstmGenerator(output_dim=OUT, variant="l", cell_size=13,
                                lstm_impl="scan")
    wave_gen = ResLstmGenerator(output_dim=OUT, variant="l", cell_size=13,
                                lstm_impl="wavefront")
    params = scan_gen.init(jax.random.PRNGKey(0), x, lens)

    def loss(gen):
        return lambda p, x: jnp.sum(jnp.sin(gen.apply(p, x, lens, True)))

    with pltpu.force_tpu_interpret_mode():
        o_wave = wave_gen.apply(params, x, lens)
        g_wave = jax.grad(loss(wave_gen), argnums=(0, 1))(params, x)
    o_scan = scan_gen.apply(params, x, lens)
    g_scan = jax.grad(loss(scan_gen), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(o_wave), np.asarray(o_scan),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(g_wave), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_base_variant_wavefront_and_i_fallback(rng):
    """res_lstm_base rides the fused plain stack; res_lstm_i (whose top
    tap adds the ORIGINAL inputs) silently falls back to the per-layer
    kernels — both must match scan."""
    T4 = 16
    x = jnp.asarray(rng.normal(size=(B, T4, D)), jnp.float32)
    lens = jnp.array([T4, 11, 5], jnp.int32)
    for variant in ("base", "i"):
        scan_gen = ResLstmGenerator(output_dim=OUT, variant=variant,
                                    cell_size=13, lstm_impl="scan")
        wave_gen = ResLstmGenerator(output_dim=OUT, variant=variant,
                                    cell_size=13, lstm_impl="wavefront")
        params = scan_gen.init(jax.random.PRNGKey(0), x, lens)

        def loss(gen):
            return lambda p, xx: jnp.sum(jnp.sin(gen.apply(p, xx, lens,
                                                           True)))

        with pltpu.force_tpu_interpret_mode():
            o_wave = wave_gen.apply(params, x, lens)
            g_wave = jax.grad(loss(wave_gen), argnums=(0, 1))(params, x)
        o_scan = scan_gen.apply(params, x, lens)
        g_scan = jax.grad(loss(scan_gen), argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(o_wave), np.asarray(o_scan),
                                   atol=1e-5)
        for a, b in zip(jax.tree.leaves(g_wave), jax.tree.leaves(g_scan)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

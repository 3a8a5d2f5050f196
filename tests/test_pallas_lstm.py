"""Pallas fused LSTM kernel parity vs the scan implementation.

Runs in interpreter mode so the CPU test mesh can execute the TPU kernel;
the same comparison was validated compiled on real TPU hardware (bit-exact
forward, ~1e-6 gradient deltas).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from rsrgan_tpu.ops.lstm import LstmCellP

B, T, D, U, P = 4, 23, 9, 24, 9


@pytest.fixture
def cells():
    scan_cell = LstmCellP(num_units=U, num_proj=P, lstm_impl="scan")
    pal_cell = LstmCellP(num_units=U, num_proj=P, lstm_impl="pallas")
    return scan_cell, pal_cell


def test_forward_and_grads_match_scan(cells, rng):
    scan_cell, pal_cell = cells
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lens = jnp.array([T, T - 5, 7, T], jnp.int32)
    params = scan_cell.init(jax.random.PRNGKey(0), x, lens)

    def loss(cell):
        return lambda p, x: jnp.sum(jnp.sin(cell.apply(p, x, lens)))

    with pltpu.force_tpu_interpret_mode():
        o_pal = pal_cell.apply(params, x, lens)
        g_pal = jax.grad(loss(pal_cell), argnums=(0, 1))(params, x)
    o_scan = scan_cell.apply(params, x, lens)
    g_scan = jax.grad(loss(scan_cell), argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_scan),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_masked_tail_invariance(cells, rng):
    _, pal_cell = cells
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    lens = jnp.array([10, 8, 6, 12], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        params = pal_cell.init(jax.random.PRNGKey(1), jnp.asarray(x), lens)
        o1 = pal_cell.apply(params, jnp.asarray(x), lens)
        x2 = x.copy()
        x2[:, 13:] = 77.0
        o2 = pal_cell.apply(params, jnp.asarray(x2), lens)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    assert np.all(np.asarray(o1)[1, 8:] == 0)


def test_accumulator_backward_matches_scan(rng):
    """B >= _ACC_BWD_MIN_BATCH selects the in-kernel weight-grad variant;
    gradients must still match the scan cell."""
    from rsrgan_tpu.ops.pallas_lstm import _ACC_BWD_MIN_BATCH

    b = _ACC_BWD_MIN_BATCH
    scan_cell = LstmCellP(num_units=U, num_proj=P, lstm_impl="scan")
    pal_cell = LstmCellP(num_units=U, num_proj=P, lstm_impl="pallas")
    x = jnp.asarray(rng.normal(size=(b, 11, D)), jnp.float32)
    lens = jnp.asarray(rng.integers(3, 12, size=(b,)), jnp.int32)
    params = scan_cell.init(jax.random.PRNGKey(0), x, lens)

    def loss(cell):
        return lambda p, x: jnp.sum(jnp.sin(cell.apply(p, x, lens)))

    with pltpu.force_tpu_interpret_mode():
        o_pal = pal_cell.apply(params, x, lens)
        g_pal = jax.grad(loss(pal_cell), argnums=(0, 1))(params, x)
    o_scan = scan_cell.apply(params, x, lens)
    g_scan = jax.grad(loss(scan_cell), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_scan),
                               atol=1e-5)
    for a, b_ in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4)


def test_bf16_gradients_close_to_f32_scan(rng):
    """compute_dtype=bf16 stores the saved activations in bf16; gradients
    must stay within bf16-scale error of the f32 scan cell (guards the
    production --bf16=true path that the exact-parity tests skip)."""
    scan_f32 = LstmCellP(num_units=U, num_proj=P, lstm_impl="scan")
    pal_bf16 = LstmCellP(num_units=U, num_proj=P, lstm_impl="pallas",
                         compute_dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    lens = jnp.array([T, T - 5, 7, T], jnp.int32)
    params = scan_f32.init(jax.random.PRNGKey(0), x, lens)

    def loss(cell):
        return lambda p, x: jnp.mean(jnp.sin(cell.apply(p, x, lens)))

    with pltpu.force_tpu_interpret_mode():
        g_bf = jax.grad(loss(pal_bf16), argnums=(0, 1))(params, x)
    g_fp = jax.grad(loss(scan_f32), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_bf), jax.tree.leaves(g_fp)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() <= 0.05 * scale, (
            np.abs(a - b).max(), scale)


def test_coarsened_reverse_blocks_match_scan(rng):
    """T divisible by 4 selects the R=4 reverse grid in both backward
    variants (streamed at B=4, in-kernel accumulator at the threshold
    batch); gradients must still match the scan cell."""
    from rsrgan_tpu.ops.pallas_lstm import _ACC_BWD_MIN_BATCH

    scan_cell = LstmCellP(num_units=U, num_proj=P, lstm_impl="scan")
    pal_cell = LstmCellP(num_units=U, num_proj=P, lstm_impl="pallas")
    for b, t in ((B, 24), (_ACC_BWD_MIN_BATCH, 12)):
        x = jnp.asarray(rng.normal(size=(b, t, D)), jnp.float32)
        lens = jnp.asarray(rng.integers(3, t + 1, size=(b,)), jnp.int32)
        params = scan_cell.init(jax.random.PRNGKey(0), x, lens)

        def loss(cell):
            return lambda p, x: jnp.sum(jnp.sin(cell.apply(p, x, lens)))

        with pltpu.force_tpu_interpret_mode():
            o_pal = pal_cell.apply(params, x, lens)
            g_pal = jax.grad(loss(pal_cell), argnums=(0, 1))(params, x)
        o_scan = scan_cell.apply(params, x, lens)
        g_scan = jax.grad(loss(scan_cell), argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_scan),
                                   atol=1e-5)
        for a, g in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_scan)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(g),
                                       atol=2e-4)


def _check_layer_bwd_row_offsets(rng, B_, atol):
    """lstm_layer_bwd must give identical results whether it reads a
    skewed array in place (aligned offset -> offset index maps) or falls
    back to explicit de-skew slices (misaligned offset)."""
    import jax.numpy as jnp
    from rsrgan_tpu.ops import pallas_lstm as pk

    T_, U_, P_ = 12, 8, 5
    Up = pk._round_up(U_, 128)
    G = 4 * Up
    acc = B_ >= pk._ACC_BWD_MIN_BATCH
    R = pk.bwd_rows_per_step(T_, B_, Up, P_, 4, grads_in_kernel=acc)
    assert R > 1, "need R>1 to exercise a misaligned offset"
    pad = R + R // 2  # misaligned: pad % R != 0
    assert pad % R != 0
    acts = jnp.asarray(rng.uniform(0.1, 0.9, (pad + T_ + 2, B_, G)),
                       jnp.float32)
    c_hist = jnp.asarray(rng.normal(size=(pad + T_ + 2, B_, Up)),
                         jnp.float32)
    h_hist = jnp.asarray(rng.normal(size=(pad + T_ + 2, B_, P_)),
                         jnp.float32)
    mask3 = jnp.ones((T_, 1, B_), jnp.float32)
    dout = jnp.asarray(rng.normal(size=(T_, B_, P_)), jnp.float32)
    w_h = jnp.asarray(rng.normal(0, 0.1, (P_, G)), jnp.float32)
    proj = jnp.asarray(rng.normal(0, 0.1, (Up, P_)), jnp.float32)
    peep = [jnp.asarray(rng.normal(0, 0.1, (1, Up)), jnp.float32)
            for _ in range(3)]

    def run(a, c, h, off):
        with pltpu.force_tpu_interpret_mode():
            return pk.lstm_layer_bwd(T_, B_, Up, P_, a, mask3, dout, c, h,
                                     w_h, proj, *peep, row_offset=off)

    ref = run(acts[pad:pad + T_], c_hist[pad:pad + T_],
              h_hist[pad:pad + T_], 0)
    # pad % R != 0 -> explicit-slice fallback
    mis = run(acts, c_hist, h_hist, pad)
    # pad + extra aligned to R -> in-place offset index maps
    extra = R - pad % R
    acts_a = jnp.concatenate([jnp.zeros((extra,) + acts.shape[1:]), acts])
    c_a = jnp.concatenate([jnp.zeros((extra,) + c_hist.shape[1:]), c_hist])
    h_a = jnp.concatenate([jnp.zeros((extra,) + h_hist.shape[1:]), h_hist])
    assert (pad + extra) % R == 0
    ali = run(acts_a, c_a, h_a, pad + extra)
    for a, b in zip(mis, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)
    for a, b in zip(ali, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


def test_layer_bwd_row_offset_paths(rng):
    """Streamed backward variant (small B)."""
    _check_layer_bwd_row_offsets(rng, 2, 1e-6)


def test_layer_bwd_row_offset_paths_acc_variant(rng):
    """In-kernel-accumulator backward variant (B >= _ACC_BWD_MIN_BATCH)
    with aligned and misaligned row offsets — the path training hits at
    B>=32 with the wavefront generator (advisor round-1 finding)."""
    from rsrgan_tpu.ops.pallas_lstm import _ACC_BWD_MIN_BATCH

    _check_layer_bwd_row_offsets(rng, _ACC_BWD_MIN_BATCH, 1e-5)

"""Streaming enhancer: chunked forward == whole-utterance forward."""

import jax
import jax.numpy as jnp
import numpy as np

from rsrgan_tpu.models.recurrent import ResLstmGenerator
from rsrgan_tpu.serving import StreamingEnhancer

B, T, P, OUT = 2, 24, 7, 3


def test_chunked_matches_full(rng):
    gen = ResLstmGenerator(output_dim=OUT, variant="l", cell_size=11,
                           lstm_impl="scan")
    x = jnp.asarray(rng.normal(size=(B, T, P)), jnp.float32)
    lens = jnp.full((B,), T, jnp.int32)
    variables = gen.init(jax.random.PRNGKey(0), x, lens)
    full = np.asarray(gen.apply(variables, x, lens))

    enhancer = StreamingEnhancer(variables["params"])
    state = enhancer.init_state(B)
    outs = []
    for start, size in ((0, 5), (5, 11), (16, 8)):  # uneven chunks
        out, state = enhancer.step(x[:, start:start + size], state)
        outs.append(np.asarray(out))
    chunked = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(chunked, full, atol=1e-5)


def test_state_isolation(rng):
    """Independent streams don't leak state across init_state calls."""
    gen = ResLstmGenerator(output_dim=OUT, variant="l", cell_size=11,
                           lstm_impl="scan")
    x = jnp.asarray(rng.normal(size=(B, T, P)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), x,
                         jnp.full((B,), T, jnp.int32))
    enh = StreamingEnhancer(variables["params"])
    out1, _ = enh.step(x, enh.init_state(B))
    _, carried = enh.step(x, enh.init_state(B))
    out2, _ = enh.step(x, enh.init_state(B))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3, _ = enh.step(x, carried)  # warm state -> different output
    assert not np.allclose(np.asarray(out1), np.asarray(out3))

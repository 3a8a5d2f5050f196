"""Streaming-serving latency benchmark: per-chunk step latency percentiles.

The serving story so far is measured in throughput (BENCH_NOTES.md
"Enhancement throughput"); an online dereverberation front-end also has a
LATENCY budget: each chunk of C frames covers C*10 ms of audio, so the
p99 step latency must stay under that to hold realtime. This tool times
`serving.StreamingEnhancer.step` (the same jitted program `cli/serve.py`
and the StreamPool dispatch) over many chunks and prints one JSON line
per (chunk_frames, lanes) config:

    python tools/serve_bench.py [num_chunks]

Timing notes (CLAUDE.md): `jax.block_until_ready` can return early on the
axon tunnel, so each step is synced by materializing an output element;
the measured wall time therefore includes the tunnel's ~25 ms round trip,
which dominates single-chunk latency on THIS host — the JSON separates
that out via the pipelined (no per-step sync) aggregate.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

_cache = os.path.expanduser("~/.cache/rsrgan_xla")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from rsrgan_tpu.models import get_generator  # noqa: E402
from rsrgan_tpu.serving import StreamingEnhancer  # noqa: E402

IN_DIM, OUT_DIM = 257, 40
FRAME_MS = 10.0


def bench(enhancer, lanes: int, chunk_frames: int, num_chunks: int):
    rng = np.random.default_rng(0)
    chunk = jnp.asarray(
        rng.normal(size=(lanes, chunk_frames, IN_DIM)), jnp.float32)
    state = enhancer.init_state(batch=lanes)
    # warm-up: compile + first dispatch
    y, state = enhancer.step(chunk, state)
    float(y[0, 0, 0])

    lat_ms = []
    for _ in range(num_chunks):
        t0 = time.perf_counter()
        y, state = enhancer.step(chunk, state)
        float(y[0, 0, 0])  # reliable sync on axon
        lat_ms.append((time.perf_counter() - t0) * 1e3)

    # pipelined aggregate: dispatch all chunks, sync once at the end —
    # what a serving loop that overlaps host/device work achieves
    t0 = time.perf_counter()
    for _ in range(num_chunks):
        y, state = enhancer.step(chunk, state)
    float(y[0, 0, 0])
    pipelined_ms = (time.perf_counter() - t0) * 1e3 / num_chunks

    lat = np.asarray(lat_ms)
    budget_ms = chunk_frames * FRAME_MS
    return {
        "metric": "stream_step_latency_ms",
        "lanes": lanes,
        "chunk_frames": chunk_frames,
        "chunk_audio_ms": budget_ms,
        "p50": round(float(np.percentile(lat, 50)), 3),
        "p95": round(float(np.percentile(lat, 95)), 3),
        "p99": round(float(np.percentile(lat, 99)), 3),
        "pipelined_mean": round(pipelined_ms, 3),
        "realtime_p99": bool(np.percentile(lat, 99) < budget_ms),
        "frames_per_sec_synced": round(
            lanes * chunk_frames / (lat.mean() * 1e-3)),
    }


def main() -> int:
    num_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    gen = get_generator("res_lstm_l", input_dim=IN_DIM, output_dim=OUT_DIM,
                        compute_dtype=jnp.bfloat16)
    x = jnp.zeros((1, 8, IN_DIM), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x,
                      jnp.full((1,), 8, jnp.int32))["params"]
    enhancer = StreamingEnhancer(params, variant="res_lstm_l")
    # 32/64 lanes show occupancy scaling toward the ~1 ms/chunk device
    # time: per-step latency grows slowly with lanes while aggregate
    # frames/sec climbs until the MXU saturates
    for lanes in (1, 8, 32, 64):
        for chunk_frames in (10, 50):
            print(json.dumps(bench(enhancer, lanes, chunk_frames,
                                   num_chunks)))
    return 0


if __name__ == "__main__":
    sys.exit(main())

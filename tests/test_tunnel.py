"""Tunnel watchdog behavior (rsrgan_tpu/tunnel.py).

The axon TPU handoff hang blocks inside a native call, so the watchdog
must work from a thread, re-exec once, and hard-exit legibly on a second
stall. Driven in a subprocess with jax stubbed to hang deterministically.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HANG_SCRIPT = textwrap.dedent(f'''
    import sys, types, time, os
    sys.path.insert(0, {REPO!r})
    fake_jnp = types.ModuleType("jax.numpy")
    def ones(shape):
        time.sleep(999)
    fake_jnp.ones = ones
    fake_jax = types.ModuleType("jax"); fake_jax.numpy = fake_jnp
    sys.modules["jax"] = fake_jax; sys.modules["jax.numpy"] = fake_jnp
    from rsrgan_tpu.tunnel import ensure_device_up
    print("attempt", os.environ.get("RSRGAN_TUNNEL_RETRY", "first"),
          flush=True)
    ensure_device_up(timeout_s=2, cooldown_s=0.5)
    print("device up", flush=True)
''')


def _run(script: str, env_extra=None):
    path = "/tmp/_tunnel_watchdog_test.py"
    with open(path, "w") as f:
        f.write(script)
    env = {k: v for k, v in os.environ.items()
           if k != "RSRGAN_TUNNEL_RETRY"}
    env.update(env_extra or {})
    return subprocess.run([sys.executable, path], capture_output=True,
                          text=True, timeout=60, env=env)


def test_hang_reexecs_once_then_exits_70():
    r = _run(HANG_SCRIPT)
    assert r.returncode == 70, (r.returncode, r.stdout, r.stderr)
    assert "attempt first" in r.stdout
    assert "attempt 1" in r.stdout      # the re-exec really happened
    assert "re-exec" in r.stdout
    assert "rerun this stage" in r.stderr
    assert "device up" not in r.stdout


def test_platform_override_pins_cpu():
    """RSRGAN_PLATFORM=cpu must pin the real jax backend to CPU through
    jax.config (env vars alone are overridden by the axon plugin on this
    host) — the chip-free recipe-validation path."""
    script = textwrap.dedent(f'''
        import sys
        sys.path.insert(0, {REPO!r})
        from rsrgan_tpu.tunnel import ensure_device_up
        ensure_device_up(timeout_s=60)
        import jax
        assert jax.default_backend() == "cpu", jax.default_backend()
        print("backend cpu ok", flush=True)
    ''')
    r = _run(script, env_extra={"RSRGAN_PLATFORM": "cpu"})
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "backend cpu ok" in r.stdout


def test_healthy_probe_passes_through():
    script = HANG_SCRIPT.replace("time.sleep(999)", "return 1.0")
    r = _run(script)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "device up" in r.stdout
    assert "re-exec" not in r.stdout

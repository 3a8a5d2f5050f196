"""Axon-tunnel liveness watchdog shared by every TPU-touching entry point.

The experimental axon TPU tunnel grants the chip to ONE process; a client
that starts while the previous holder's session is still open blocks
forever inside the plugin's native connection loop (observed: main thread
in ``hrtimer_nanosleep``, an ``axon-remote-loo`` thread on a futex). The
recipes sleep between stages, but any CPU contention can stretch the
outgoing process's teardown past that window — so processes must defend
themselves.

SIGALRM cannot do it: the block is one long native call, so the Python
handler is deferred forever. ``ensure_device_up()`` instead starts a
watchdog THREAD: if one trivial device op doesn't complete within the
window, the process re-execs itself once after a cooldown (argv
preserved, repo root pinned onto PYTHONPATH, the axon site path kept); a
second stall hard-exits 70 so the recipe fails legibly instead of
hanging. Mirrors bench.py's round-2 watchdog, upgraded to survive
native-blocked init.
"""

from __future__ import annotations

import os
import sys
import threading
import time

_ENV_FLAG = "RSRGAN_TUNNEL_RETRY"
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def apply_platform_override() -> None:
    """``RSRGAN_PLATFORM=cpu`` pins the CLIs to a backend (debug / CI /
    tunnel-outage runs without the chip). Plain ``JAX_PLATFORMS=cpu`` is
    NOT enough on this machine — the axon plugin pins the env var — so
    this goes through jax.config, which must happen before any device
    query (tests/conftest.py is the same recipe)."""
    plat = os.environ.get("RSRGAN_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platform_name", plat)
        jax.config.update("jax_platforms", plat)


def ensure_device_up(timeout_s: float = 180.0,
                     cooldown_s: float = 30.0) -> None:
    """Prove the default backend is alive, or re-exec once, or exit 70.

    Call from CLI ``main()`` before any side effects (checkpoint writes,
    output files): the re-exec restarts the whole process image.
    """
    apply_platform_override()
    done = threading.Event()

    def watchdog() -> None:
        if done.wait(timeout_s):
            return
        if os.environ.get(_ENV_FLAG):
            print("ERROR: TPU tunnel did not come up after a re-exec "
                  "retry; a previous process may still hold the device — "
                  "wait and rerun this stage", file=sys.stderr, flush=True)
            os._exit(70)
        os.environ[_ENV_FLAG] = "1"
        print("WARNING: TPU init stalled; re-exec after cooldown",
              flush=True)
        time.sleep(cooldown_s)
        # re-exec via the script path: pin the repo root onto PYTHONPATH
        # (``python -m pkg.mod`` becomes ``python .../mod.py``, which
        # drops the cwd-based import root) while KEEPING the axon site
        # dir already there
        existing = os.environ.get("PYTHONPATH", "")
        if _REPO_ROOT not in existing.split(":"):
            os.environ["PYTHONPATH"] = (f"{_REPO_ROOT}:{existing}"
                                        if existing else _REPO_ROOT)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    t = threading.Thread(target=watchdog, daemon=True,
                         name="tunnel-watchdog")
    t.start()
    try:
        import jax.numpy as jnp

        float(jnp.ones(()) + 1)  # blocks until the tunnel responds
    finally:
        done.set()
    os.environ.pop(_ENV_FLAG, None)

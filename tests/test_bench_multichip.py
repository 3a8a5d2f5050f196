"""bench_multichip --cpu-validate must run the sharded bench loop.

Runs in-process (the pytest session already forces an 8-device CPU mesh)
by setting the child flag, so no second jax import is paid.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_cpu_validate_inprocess(monkeypatch, capsys):
    import bench_multichip

    monkeypatch.setenv("_RSRGAN_MCBENCH_CHILD", "1")
    monkeypatch.setattr(sys, "argv",
                        ["bench_multichip.py", "4", "--cpu-validate"])
    assert bench_multichip.main() == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["devices"] == 4
    assert rec["value"] > 0
    assert abs(rec["per_chip"] * 4 - rec["value"]) < 1.0

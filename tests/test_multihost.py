"""Multi-host mesh validation: the `data` axis really crosses processes.

tests/test_parallel.py proves sharded==unsharded within ONE process;
this proves the same train step is process-count-transparent — the
multi-controller runtime a TPU pod runs (one process per host,
`jax.distributed.initialize`, global `jax.devices()`), emulated here as
two coordinated CPU processes forming one 8-device mesh. The reference
has no counterpart: its only parallelism is single-process
nn.DataParallel (train.py:26-28).

Runs tools/multihost_cpu_check.py's orchestrator in a subprocess (it
spawns a single-process 8-device reference run plus 2x4-device
distributed workers and compares params/losses) and asserts on the JSON
it writes.
"""

import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_multihost_data_axis_crosses_processes(tmp_path):
    out = tmp_path / "multihost.json"
    env = dict(os.environ)
    # children force their own CPU/device-count env; the orchestrator
    # itself never touches a backend
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_cpu_check.py"),
         "--out", str(out)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-2000:]
    result = json.loads(out.read_text())
    assert result["ok"]
    assert result["n_processes"] == 2
    assert result["global_devices"] == 8
    assert result["max_param_abs_diff"] <= 1e-5
    assert result["losses_multihost"] == result["losses_singleproc"]

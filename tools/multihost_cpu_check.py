"""Multi-host mesh validation on CPU (VERDICT r3 task 9).

parallel/mesh.py claims the `data` axis is host-transparent: the same
GSPMD train step that shards ray batches over one host's chips must work
unchanged when the mesh spans *processes* (the multi-controller JAX
runtime a TPU pod slice runs — one process per host, `jax.devices()`
global, collectives over ICI/DCN). This tool proves it without TPU
hardware: it forms ONE 8-device mesh out of TWO OS processes (4 virtual
CPU devices each, `jax.distributed.initialize` with a localhost
coordinator) and runs the FULL human train step — sampling, mesh
queries, MLPs, Adam — for several steps, then checks the resulting
params/losses are identical to a single-process 8-device run of the
same setup (which tests/test_parallel.py already proves equals the
unsharded math).

Usage:
    python tools/multihost_cpu_check.py            # orchestrates everything
    # internal roles (spawned by the orchestrator):
    python tools/multihost_cpu_check.py --role ref --out f.npz
    python tools/multihost_cpu_check.py --role worker --pid 0 \
        --coord localhost:PORT --out f.npz

Writes MULTIHOST_r04.json at the repo root on success.

Reference counterpart: the torch reference's only parallelism is
single-process nn.DataParallel (train.py:26-28); spanning hosts is a
capability the reference does not have at all.
"""

import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
STEPS = 3


def _run_steps():
    """Shared by both roles: 3 sharded train steps over all global devices.

    Everything that crosses into the jitted step is either baked-in numpy
    (trace-time constants, replicated by compilation on every process) or
    explicitly device_put with a global sharding — no process-local jnp
    closures, which is exactly the discipline a real multi-host run needs.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    from neuman_tpu.parallel.dryrun import (
        human_training_setup,
        tiny_human_config,
    )
    from neuman_tpu.parallel.mesh import make_mesh, put_replicated
    from neuman_tpu.trainers.human import make_human_train_step

    n = len(jax.devices())
    assert n == 8, f"expected 8 global devices, got {n}"
    mesh = make_mesh(8)
    cfg = tiny_human_config(8)
    cfg.use_pallas = False
    spec, params, arrays, ctx, optimizer = human_training_setup(cfg)

    # host-numpy params so every process feeds identical values in;
    # arrays/ctx stay as the setup produced them (the same objects any
    # single-controller caller closes over) — proving the step's closures
    # survive the multi-controller runtime unchanged.
    params = jax.tree_util.tree_map(np.asarray, params)

    state = {
        "params": put_replicated(
            jax.tree_util.tree_map(jnp.asarray, params), mesh
        ),
        "opt_state": put_replicated(optimizer.init(params), mesh),
        "iteration": jnp.int32(0),
        "rng": jax.random.PRNGKey(0),
    }
    step = make_human_train_step(
        spec, cfg, arrays, list(range(4)), optimizer, ctx, mesh=mesh
    )
    losses = []
    for _ in range(STEPS):
        state, metrics = step(state)
        losses.append(
            float(np.asarray(metrics["total_loss"].addressable_data(0)))
        )
    leaves, treedef = jax.tree_util.tree_flatten(state["params"])
    flat = {
        f"leaf_{i}": np.asarray(l.addressable_data(0))
        for i, l in enumerate(leaves)
    }
    flat["losses"] = np.array(losses, np.float64)
    return flat


def _role_ref(out):
    flat = _run_steps()
    import numpy as np

    np.savez(out, **flat)


def _role_worker(pid, coord, out):
    import jax

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert len(jax.local_devices()) == 4, len(jax.local_devices())
    assert len(jax.devices()) == 8, len(jax.devices())
    flat = _run_steps()
    if pid == 0:
        import numpy as np

        np.savez(out, **flat)


def _spawn(args, extra_env):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.update(extra_env)
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)] + args,
        env=env,
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def orchestrate(out_json):
    import numpy as np

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    import tempfile

    tmp = tempfile.mkdtemp(prefix="neuman_multihost_")
    ref_npz = os.path.join(tmp, "ref.npz")
    mh_npz = os.path.join(tmp, "multihost.npz")

    base = {"JAX_PLATFORMS": "cpu"}
    ref = _spawn(
        ["--role", "ref", "--out", ref_npz],
        {**base, "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    workers = [
        _spawn(
            ["--role", "worker", "--pid", str(pid), "--coord", coord,
             "--out", mh_npz],
            {**base,
             "XLA_FLAGS": "--xla_force_host_platform_device_count=4"},
        )
        for pid in range(2)
    ]
    logs = {}
    logs["ref"], _ = ref.communicate(timeout=1200)
    for i, w in enumerate(workers):
        logs[f"worker{i}"], _ = w.communicate(timeout=1200)
    rcs = {"ref": ref.returncode,
           **{f"worker{i}": w.returncode for i, w in enumerate(workers)}}
    if any(rc != 0 for rc in rcs.values()):
        for name, log in logs.items():
            print(f"=== {name} (rc={rcs[name]}) ===\n{log[-4000:]}")
        raise SystemExit(f"multihost check failed: {rcs}")

    a, b = np.load(ref_npz), np.load(mh_npz)
    np.testing.assert_allclose(a["losses"], b["losses"], rtol=1e-4)
    max_dp = 0.0
    n_leaves = 0
    for key in a.files:
        if not key.startswith("leaf_"):
            continue
        n_leaves += 1
        np.testing.assert_allclose(b[key], a[key], atol=1e-5, err_msg=key)
        if a[key].size:
            max_dp = max(max_dp, float(np.max(np.abs(b[key] - a[key]))))
    result = {
        "n_processes": 2,
        "devices_per_process": 4,
        "global_devices": 8,
        "steps": STEPS,
        "losses_singleproc": a["losses"].tolist(),
        "losses_multihost": b["losses"].tolist(),
        "param_leaves_compared": n_leaves,
        "max_param_abs_diff": max_dp,
        "ok": True,
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return result


def _force_cpu(n_local):
    """CPU backend with n_local virtual devices, conftest.py-style: the
    container's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel) at
    interpreter startup, so env from the parent is not enough — override
    before the first backend touch."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--role", default="orchestrate",
                   choices=["orchestrate", "ref", "worker"])
    p.add_argument("--pid", type=int, default=0)
    p.add_argument("--coord", default="")
    p.add_argument("--out", default=os.path.join(REPO, "MULTIHOST_r04.json"))
    args = p.parse_args()
    sys.path.insert(0, REPO)
    if args.role == "ref":
        _force_cpu(8)
        _role_ref(args.out)
    elif args.role == "worker":
        _force_cpu(4)
        _role_worker(args.pid, args.coord, args.out)
    else:
        orchestrate(args.out)


if __name__ == "__main__":
    main()

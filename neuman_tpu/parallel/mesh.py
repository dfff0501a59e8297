"""Device mesh + sharding helpers.

The reference's only parallelism is single-process `nn.DataParallel` over
local GPUs (train.py:26-28; SURVEY.md §2.10). The TPU-native equivalent is
GSPMD data parallelism over a 1-D `data` mesh axis:

- parameters are replicated (the MLPs are 256-wide — nothing to shard);
- ray batches shard along their leading axis; every per-ray computation
  (sampling, MLP evals, mesh queries, integration) then partitions across
  chips with zero code changes, and gradient all-reduce is inserted by XLA
  over ICI automatically;
- renderers shard whole-image ray grids the same way.

The `data` axis works across any device set (one host's chips, a v4-8
slice, or multi-slice via DCN) — the mesh is the only abstraction the rest
of the framework sees.
"""

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed():
    """Initialize the multi-process JAX runtime when launched on a multi-host
    topology (a pod slice, or an explicit coordinator via env).

    `jax.distributed.initialize()` must run before the first backend touch on
    every process of a multi-host job so `jax.devices()` returns the GLOBAL
    device set and the `data` mesh axis spans hosts (collectives then ride
    ICI within a slice and DCN across slices — no code changes elsewhere).
    Single-process runs (one host's chips, CPU tests) skip it: calling
    initialize() without a coordinator would fail, and the local device set
    is already the global one. Returns True when initialized.

    Activation: set NEUMAN_TPU_DISTRIBUTED=1 (TPU pod slices auto-discover
    the coordinator) or provide JAX_COORDINATOR_ADDRESS (+ the standard
    jax.distributed env contract: process id/count).
    """
    want = os.environ.get("NEUMAN_TPU_DISTRIBUTED", "") == "1" or bool(
        os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if not want:
        return False
    jax.distributed.initialize()
    return True


def resolve_mesh(opt):
    """Resolve the run's data mesh from config: a 1-D `data` mesh over all
    visible devices under data_parallel="auto" (>1 device) or "on"; None
    under "off" / a single device. Trainers replicate their state over the
    mesh and sharding-constrain each sampled ray batch
    (shard_leading_axis); renderers row-shard each chunk's ray axis — the
    GSPMD analog of the reference's nn.DataParallel (train.py:26-28)."""
    dp = getattr(opt, "data_parallel", "auto")
    if dp == "off":
        return None
    n = len(jax.devices())
    if n == 1 and dp != "on":
        return None
    return make_mesh(axis_name=getattr(opt, "data_axis", "data"))


def make_mesh(n_devices=None, axis_name="data", devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devices)} available ({devices[0].platform}); set "
                "JAX_PLATFORMS=cpu + XLA_FLAGS=--xla_force_host_platform_"
                f"device_count={n_devices} for a virtual mesh"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicated(mesh):
    return NamedSharding(mesh, P())


def row_sharded(mesh, axis_name="data"):
    return NamedSharding(mesh, P(axis_name))


def shard_leading_axis(tree, mesh, axis_name="data"):
    """with_sharding_constraint: shard each array's leading axis when it
    divides the mesh size; replicate scalars / indivisible leaves."""
    n = mesh.devices.size

    def constrain(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(axis_name))
            )
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(constrain, tree)


def put_replicated(tree, mesh):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding)
        if hasattr(x, "ndim")
        else x,
        tree,
    )

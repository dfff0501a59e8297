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

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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

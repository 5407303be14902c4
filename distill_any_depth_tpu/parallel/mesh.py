"""Device-mesh parallelism.

The TPU-native replacement for the reference's detectron2 launch/comm
scaffolding (detectron2/engine/launch.py, utils/comm.py — which never actually
synchronized gradients; SURVEY.md §2.6): a ``jax.sharding.Mesh`` over ICI with
GSPMD sharding annotations. The train step is written as a *global* program;
jit with NamedShardings shards the batch over the ``data`` axis and XLA
inserts the gradient ``psum`` automatically — the all-reduce the reference
scaffolds but never performs.

The mesh is 2-D ``(data, model)`` from day one so tensor-parallel param
shardings can be layered on without re-plumbing; with ``model=1`` it is pure
DP.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "replicate",
    "shard_batch",
    "host_local_batch_size",
]


def make_mesh(dp: int | None = None, model: int = 1, devices=None) -> Mesh:
    """1- or 2-D mesh over the available devices; ``dp=None`` uses all."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // model
    n = dp * model
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{model} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(mesh: Mesh, tree: Any) -> Any:
    """device_put every leaf fully replicated over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put array leaves with the batch axis sharded over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def host_local_batch_size(mesh: Mesh, global_batch: int) -> int:
    dp = mesh.shape["data"]
    if global_batch % dp:
        raise ValueError(f"global batch {global_batch} not divisible by data={dp}")
    return global_batch // dp

"""Tensor parallelism over the ``model`` mesh axis.

Megatron-style sharding of the ViT blocks expressed purely through GSPMD
param placement (scaling-book recipe: pick a mesh, annotate shardings, let
XLA insert the collectives):

- attention ``qkv`` kernel: output dim sharded (heads split across chips),
- attention ``proj`` kernel: input dim sharded (psum on the output),
- MLP ``fc1``/``w12``: output dim sharded; ``fc2``/``w3``: input dim sharded,
- everything else (norms, embeddings, DPT head) replicated.

Params are ``device_put`` with these shardings before the optimizer state is
created, so Adam moments inherit the layout (zeros_like preserves sharding)
and jit picks the shardings up from the committed arguments — no manual
in_shardings plumbing for the state pytree.

The reference has no TP at all (SURVEY.md §2.6: the closest thing is windowed
attention); this is capacity headroom for ViT-g-scale teachers on small-HBM
chips.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tp_param_specs", "shard_params"]


def _spec_for(path: tuple, leaf) -> P:
    keys = [str(getattr(p, "key", "")) for p in path]
    name = keys[-1] if keys else ""
    joined = "/".join(keys)
    if "attn" in keys:
        if "qkv" in keys:
            # [in, 3C] / [3C]: shard the packed head-output dim
            return P(None, "model") if name == "kernel" else P("model")
        if "proj" in keys and name == "kernel":
            return P("model", None)  # contraction dim sharded -> psum
    if "mlp" in keys:
        if any(k in ("fc1", "w12") for k in keys):
            return P(None, "model") if name == "kernel" else P("model")
        if any(k in ("fc2", "w3") for k in keys) and name == "kernel":
            return P("model", None)
    del joined, leaf
    return P()  # replicated


def tp_param_specs(params: Any) -> Any:
    """PartitionSpec pytree for Megatron-style TP over ``model``."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """device_put the params with TP shardings (pure DP when model=1)."""
    specs = tp_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)), params, specs
    )

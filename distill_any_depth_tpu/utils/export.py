"""Ahead-of-time model export for serving.

The TPU-native equivalent of the reference's TorchScript deployment example
(detectron2/tools/deploy/torchscript_mask_rcnn.cpp — SURVEY.md §2.7 maps it
to "AOT-compiled XLA executable example"): serialize the jitted forward as a
portable StableHLO artifact with `jax.export`. The artifact embeds the
weights and can be loaded and executed by any JAX process (or an XLA C++
runner) without the model code.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["export_forward", "load_exported"]


def export_forward(
    model,
    params: Any,
    image_size: int,
    batch_size: int = 1,
    dtype=jnp.float32,
) -> bytes:
    """Serialize ``model.apply`` at a fixed shape to a StableHLO artifact.

    The params are closed over as constants (serving artifact = code +
    weights); the only runtime input is the image batch.
    """
    from jax import export as jax_export

    def forward(x):
        depth, _ = model.apply({"params": params}, x)
        return depth.astype(jnp.float32)

    spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size, 3), dtype)
    exported = jax_export.export(jax.jit(forward))(spec)
    return bytes(exported.serialize())  # serialize() returns a bytearray


def load_exported(blob: bytes):
    """Deserialize an exported artifact -> callable(x) -> depth."""
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)
    return lambda x: exported.call(x)

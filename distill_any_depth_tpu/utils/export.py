"""Ahead-of-time model export for serving.

The TPU-native equivalent of the reference's TorchScript deployment example
(detectron2/tools/deploy/torchscript_mask_rcnn.cpp — SURVEY.md §2.7 maps it
to "AOT-compiled XLA executable example"): serialize the jitted forward as a
portable StableHLO artifact with `jax.export`, loadable by any JAX process
(or an XLA C++ runner) without the model code.

Two artifact flavors:

- ``export_forward`` embeds the weights as StableHLO constants — one
  self-contained file, right for small models.
- ``export_forward_with_params`` takes the params as runtime ARGUMENTS and
  ships the weights as a separate safetensors file. Large models need this:
  a ViT-L artifact would carry ~1.3 GB of embedded constants, which bloats
  the artifact and breaks HLO transports that cap program size (e.g. the
  remote-compile endpoint used here rejects big embedded constants with
  HTTP 413 — see train/step.py's no-closure rule).
"""
from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp

__all__ = [
    "export_forward",
    "load_exported",
    "export_forward_with_params",
    "load_exported_with_params",
]


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


def _flat_key(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def export_forward_with_params(
    model,
    params: Any,
    weights_path: str,
    image_size: int,
    batch_size: int = 1,
    dtype=jnp.float32,
) -> bytes:
    """Weights-as-arguments export: the StableHLO program takes the param
    pytree at call time; the weights go to ``weights_path`` as safetensors
    (readable by the PyTorch side too). Returns the artifact bytes."""
    import numpy as np
    from jax import export as jax_export
    from safetensors import numpy as st_numpy

    def forward(params, x):
        depth, _ = model.apply({"params": params}, x)
        return depth.astype(jnp.float32)

    param_specs = jax.tree_util.tree_map(
        lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype), params
    )
    x_spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size, 3), dtype)
    exported = jax_export.export(jax.jit(forward))(param_specs, x_spec)

    flat = {
        _flat_key(path): np.asarray(v)
        for path, v in jax.tree_util.tree_leaves_with_path(params)
    }
    st_numpy.save_file(
        flat, weights_path,
        metadata={"layout": json.dumps({"sep": "/", "framework": "dad-tpu"})},
    )
    return bytes(exported.serialize())


def load_exported_with_params(blob: bytes, weights_path: str):
    """Deserialize a weights-as-arguments artifact + its safetensors weights
    -> callable(x) -> depth."""
    from jax import export as jax_export
    from safetensors import numpy as st_numpy

    exported = jax_export.deserialize(blob)
    flat = st_numpy.load_file(weights_path)
    params: dict = {}
    for key, v in flat.items():
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return lambda x: exported.call(params, x)

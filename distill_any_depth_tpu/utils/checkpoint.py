"""Checkpoint I/O: orbax full train state + safetensors interop.

The reference only ever saves bare model weights (safetensors, no optimizer
state — training cannot resume, tools/train_distillation.py:1611-1615). Here:

- ``save_train_state`` / ``restore_train_state``: orbax checkpoint of the
  complete ``TrainState`` (params + Adam moments + step) for exact resume;
- ``save_safetensors`` / ``load_safetensors``: reference-layout weight files
  (tools/convert_checkpoint.py interop), so checkpoints flow both ways
  between this framework and the PyTorch implementation.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

from distill_any_depth_tpu.configs import ModelConfig
from distill_any_depth_tpu.utils.torch_interop import (
    params_to_torch,
    torch_to_params,
)

__all__ = [
    "save_train_state",
    "restore_train_state",
    "save_safetensors",
    "load_safetensors",
    "convert_checkpoint",
]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(path: str, state: Any) -> None:
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(state), force=True)


def restore_train_state(path: str, template: Any | None = None) -> Any:
    path = os.path.abspath(path)
    # Accept the run's output dir as well as the orbax dir itself:
    # Trainer saves the resumable state under <output_dir>/train_state.
    nested = os.path.join(path, "train_state")
    if not os.path.exists(os.path.join(path, "_METADATA")) and os.path.isdir(nested):
        path = nested
    if template is not None:
        import orbax.checkpoint as ocp

        return _checkpointer().restore(
            path, args=ocp.args.PyTreeRestore(item=template)
        )
    return _checkpointer().restore(path)


def save_safetensors(path: str, params: Any, cfg: ModelConfig) -> None:
    """Export params as a reference-layout safetensors file."""
    from safetensors import numpy as st_numpy

    state = {
        k: np.ascontiguousarray(np.asarray(v, dtype=np.float32))
        for k, v in params_to_torch(jax.device_get(params), cfg).items()
    }
    st_numpy.save_file(state, path)


def load_safetensors(
    path: str, cfg: ModelConfig, strict: bool = True, template: Any | None = None
) -> dict:
    """Load a reference-layout checkpoint. ``template`` (e.g. freshly
    initialized params) supplies leaves the torch file cannot carry —
    LoRA/SSF adapters — which are overlaid with the loaded base weights."""
    from safetensors import numpy as st_numpy

    loaded = torch_to_params(st_numpy.load_file(path), cfg, strict=strict)
    if template is None:
        return loaded
    return merge_params(template, loaded)


def merge_params(template: Any, loaded: Any) -> Any:
    """Overlay ``loaded`` leaves onto ``template`` (dicts merged recursively;
    leaves present in both take the loaded value)."""
    if isinstance(template, dict) and isinstance(loaded, dict):
        out = dict(template)
        for k, v in loaded.items():
            out[k] = merge_params(template.get(k), v) if k in template else v
        return out
    return loaded if loaded is not None else template


def convert_checkpoint(in_path: str, out_path: str) -> int:
    """pretrained.* -> backbone.* key remap (tools/convert_checkpoint.py:7-28):
    turns a DepthAnything-V2 checkpoint into the teacher-arch namespace.
    Returns the number of remapped keys."""
    from safetensors import numpy as st_numpy

    state = st_numpy.load_file(in_path)
    out, n = {}, 0
    for k, v in state.items():
        if k.startswith("pretrained."):
            out["backbone." + k[len("pretrained."):]] = v
            n += 1
        else:
            out[k] = v
    st_numpy.save_file(out, out_path)
    return n

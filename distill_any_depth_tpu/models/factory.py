"""Model factory: named presets -> initialized DepthModel.

Replaces the reference's scattered model_kwargs tables
(tools/testers/infer.py:66-84, tools/train_distillation.py:711-815).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from distill_any_depth_tpu.configs import ModelConfig, model_config
from distill_any_depth_tpu.models.dpt import DepthModel

__all__ = ["create_model", "init_params"]


def create_model(
    arch_name: str | ModelConfig,
    dtype: Any = jnp.float32,
    attn_impl: str = "auto",
    remat: bool = False,
    gelu: str = "auto",
    quant: str = "none",
    fused_tail: bool = False,
) -> DepthModel:
    """``quant="int8"``: run the encoder GEMMs as dynamic W8A8 int8 (2x MXU
    rate on v5e; ops/quant.py). Inference-only — keep "none" for any model
    that receives gradients.

    ``fused_tail``: run the DPT-head tail as one Pallas kernel
    (ops/dpt_tail). Forward-only like ``quant`` — enable on inference /
    pseudo-label / stop-gradient-teacher models, never the student."""
    cfg = arch_name if isinstance(arch_name, ModelConfig) else model_config(arch_name)
    return DepthModel(cfg=cfg, dtype=dtype, attn_impl=attn_impl, remat=remat,
                      gelu=gelu, quant=quant, fused_tail=fused_tail)


def resolve_fused_tail(mode) -> bool:
    """Resolve a ``fused_tail`` CLI/config setting to a bool.

    ``True``/``False`` pass through; ``"on"``/``"off"`` map to them;
    ``"auto"``/``None`` enable the fused Pallas tail only when the default
    backend is a real TPU (the kernel is interpret-emulated — slow — on
    CPU, and the packed XLA tail is already optimal there)."""
    if isinstance(mode, bool):
        return mode
    if mode in (None, "auto"):
        return jax.devices()[0].platform == "tpu"
    return mode == "on"


def init_params(
    model: DepthModel, rng: jax.Array | int = 0, image_size: int = 392
) -> dict:
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    dummy = jnp.zeros((1, image_size, image_size, 3), model.dtype)
    variables = model.init(rng, dummy)
    return variables["params"]

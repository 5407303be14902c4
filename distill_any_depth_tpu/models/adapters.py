"""Parameter-efficient tuning adapters: LoRA and SSF.

Covers the reference's ViT-with-registers tuning machinery
(modeling/backbones/vit/ViT_DINO_reg.py — SSF scale/shift adapters :29-45 and
r=8 LoRA on attention qkv/proj :48-133,400-412) as composable flax modules,
plus an optax param-label helper so only adapters train during fine-tuning.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["LoRADense", "ssf", "adapter_label_tree"]


class LoRADense(nn.Module):
    """Dense with an additive low-rank update: ``x W + (x A) B * (alpha/r)``.

    The base ``kernel``/``bias`` params share the plain nn.Dense naming, so
    torch-checkpoint interop is unchanged; ``lora_a``/``lora_b`` are
    adapter-only siblings (A ~ N(0, 1/r), B = 0: identity at init, the
    standard LoRA initialization).
    """

    features: int
    rank: int
    alpha: float = 8.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(stddev=0.02),
            (in_dim, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = x @ kernel.astype(self.dtype) + bias.astype(self.dtype)
        if self.rank <= 0:
            return y
        a = self.param(
            "lora_a",
            nn.initializers.normal(stddev=1.0 / self.rank),
            (in_dim, self.rank),
            jnp.float32,
        )
        b = self.param(
            "lora_b", nn.initializers.zeros, (self.rank, self.features), jnp.float32
        )
        scaling = self.alpha / self.rank
        update = (x @ a.astype(self.dtype)) @ b.astype(self.dtype)
        return y + update * scaling


class ssf(nn.Module):
    """SSF scale/shift adapter: ``gamma * x + beta`` on the channel axis
    (ssf_ada, ViT_DINO_reg.py:29-45); identity at init (gamma=1, beta=0)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (dim,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (dim,), jnp.float32)
        return x * gamma.astype(self.dtype) + beta.astype(self.dtype)


def adapter_label_tree(params: Any) -> Any:
    """Label each leaf 'adapter' (LoRA/SSF params) or 'frozen' — feed to
    ``optax.multi_transform`` for adapter-only fine-tuning."""
    import jax

    def label(path, _):
        keys = [getattr(p, "key", "") for p in path]
        is_adapter = any(
            k in ("lora_a", "lora_b") or str(k).startswith("ssf") for k in keys
        )
        return "adapter" if is_adapter else "frozen"

    return jax.tree_util.tree_map_with_path(label, params)

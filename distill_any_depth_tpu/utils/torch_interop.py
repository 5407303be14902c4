"""PyTorch <-> JAX checkpoint interop.

Maps the reference's safetensors/state-dict layout onto this framework's flax
param pytree, including the reference's two key-remap rules:

- ``pretrained.*`` <-> ``backbone.*`` prefix (teacher checkpoints,
  tools/train_distillation.py:753-766, tools/convert_checkpoint.py:7-28);
- ``blocks.{i}.*`` <-> ``blocks.0.{i}.*`` chunked namespace (teacher ViT,
  modeling/backbones/vit/ViT_DINO.py:1374-1392).

Weight-layout transforms (torch -> flax/NHWC):

- Linear ``[out, in]`` -> ``[in, out]`` (transpose)
- Conv2d OIHW ``[O, I, kh, kw]`` -> HWIO ``[kh, kw, I, O]``
- 1x1 Conv2d -> Dense ``[I, O]``
- Patch-embed conv ``[D, C, p, p]`` -> matmul kernel ``[p*p*C, D]``
  (ordering (ph, pw, c), see models/vit.PatchEmbed)
- ConvTranspose2d(k=s) ``[I, O, k, k]`` -> PatchExpand kernel ``[I, k*k*O]``
  (ordering (kh, kw, o), see models/dpt.PatchExpand)
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

from distill_any_depth_tpu.configs import ModelConfig

__all__ = [
    "normalize_torch_keys",
    "torch_to_params",
    "params_to_torch",
    "load_safetensors_params",
]


def normalize_torch_keys(state: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Canonicalize reference key variants to the ``pretrained.blocks.{i}``
    namespace this converter expects."""
    out = {}
    chunked = re.compile(r"^(pretrained|backbone)\.blocks\.0\.(\d+)\.")
    for k, v in state.items():
        if k.startswith("backbone."):
            k = "pretrained." + k[len("backbone."):]
        m = chunked.match(k)
        if m and m.group(1) == "pretrained":
            # blocks.0.{i}.rest -> blocks.{i}.rest  (block_chunks=1 namespace)
            rest = k[m.end():]
            k = f"pretrained.blocks.{m.group(2)}.{rest}"
        out[k] = v
    return out


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x.T)


# LoRA scaling bridge: the reference's LoRALinear uses lora_alpha=1, r=8
# (ViT_DINO_reg.py:402,410 -> scaling = alpha/r = 1/8) while LoRADense uses
# alpha=8 (scaling = 8/r = 1). x A^T B^T / 8 == x a b * 1 when a = A^T and
# b = B^T / 8 — the factor is a power of two, so the round-trip is exact.
_LORA_B_REF_TO_OURS = 1.0 / 8.0


def _conv_hwio(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(x, (2, 3, 1, 0)))


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    # own the memory: torch tensor.numpy() (and mmap'd safetensors) yield
    # views, and in-place updates on the source would silently mutate the
    # converted tree. Kernels transposed via _t/_conv_hwio already own their
    # data, so this copies only pass-through leaves (biases, tokens, norms).
    if not value.flags["OWNDATA"]:
        value = np.array(value, copy=True)
    node[path[-1]] = value


def torch_to_params(
    state: Mapping[str, np.ndarray], cfg: ModelConfig, strict: bool = True
) -> dict:
    """Convert a reference state dict to this framework's param pytree."""
    state = normalize_torch_keys(state)
    params: dict = {}
    unused: list[str] = []
    blk = re.compile(r"^pretrained\.blocks\.(\d+)\.(.+)$")
    rn = re.compile(r"^depth_head\.scratch\.refinenet(\d)\.(.+)$")

    for key, v in state.items():
        v = np.asarray(v)
        if key.startswith("adapters."):
            # framework-namespace adapter leaves (LoRA/SSF), stored verbatim
            # in the framework's own layout by params_to_torch — no torch
            # counterpart exists (the reference never persists its LoRA
            # w_a/w_b, ViT_DINO_reg.py:48-133)
            _set(params, tuple(key.split(".")[1:]), v)
        elif key in ("pretrained.cls_token", "pretrained.pos_embed",
                     "pretrained.register_tokens"):
            _set(params, ("pretrained", key.split(".")[-1]), v)
        elif key == "pretrained.mask_token":
            continue  # unused by the depth forward pass
        elif key == "pretrained.pos_conv.proj.0.weight":
            # PEG depthwise conv (ViT_DINO.py:853-860): torch groups=C weight
            # [C, 1, 37, 37] -> flax feature_group_count kernel [37, 37, 1, C]
            _set(params, ("pretrained", "pos_conv", "proj", "kernel"), _conv_hwio(v))
        elif key == "pretrained.pos_conv.proj.0.bias":
            _set(params, ("pretrained", "pos_conv", "proj", "bias"), v)
        elif key == "pretrained.patch_embed.proj.weight":
            d = v.shape[0]
            k = np.transpose(v, (2, 3, 1, 0)).reshape(-1, d)
            _set(params, ("pretrained", "patch_embed", "kernel"), np.ascontiguousarray(k))
        elif key == "pretrained.patch_embed.proj.bias":
            _set(params, ("pretrained", "patch_embed", "bias"), v)
        elif key in ("pretrained.norm.weight", "pretrained.norm.bias"):
            name = "scale" if key.endswith("weight") else "bias"
            _set(params, ("pretrained", "norm", name), v)
        elif (m := blk.match(key)):
            i, rest = m.group(1), m.group(2)
            base = ("pretrained", f"blocks_{i}")
            if rest in ("norm1.weight", "norm2.weight"):
                _set(params, base + (rest.split(".")[0], "scale"), v)
            elif rest in ("norm1.bias", "norm2.bias"):
                _set(params, base + (rest.split(".")[0], "bias"), v)
            elif rest == "ls1.gamma":
                _set(params, base + ("ls1_gamma",), v)
            elif rest == "ls2.gamma":
                _set(params, base + ("ls2_gamma",), v)
            elif rest.endswith(".weight"):
                mod = rest[: -len(".weight")]  # attn.qkv / attn.proj / mlp.fc1 ...
                _set(params, base + tuple(mod.split(".")) + ("kernel",), _t(v))
            elif rest.endswith(".bias"):
                mod = rest[: -len(".bias")]
                _set(params, base + tuple(mod.split(".")) + ("bias",), v)
            elif rest.endswith(".lora_A"):
                # reference LoRALinear A [r, in] -> LoRADense lora_a [in, r]
                mod = rest[: -len(".lora_A")]
                _set(params, base + tuple(mod.split(".")) + ("lora_a",), _t(v))
            elif rest.endswith(".lora_B"):
                # B [out, r] -> lora_b [r, out], folding the alpha ratio
                mod = rest[: -len(".lora_B")]
                _set(
                    params, base + tuple(mod.split(".")) + ("lora_b",),
                    _t(v) * _LORA_B_REF_TO_OURS,
                )
            else:
                unused.append(key)
        elif key.startswith("depth_head.projects."):
            i = key.split(".")[2]
            name = "kernel" if key.endswith("weight") else "bias"
            if name == "kernel":
                v = _t(v[:, :, 0, 0])
            _set(params, ("depth_head", f"projects_{i}", name), v)
        elif key.startswith("depth_head.resize_layers."):
            i = int(key.split(".")[2])
            name = "kernel" if key.endswith("weight") else "bias"
            if i in (0, 1):  # ConvTranspose2d [I, O, k, k] -> [I, k*k*O]
                if name == "kernel":
                    ic = v.shape[0]
                    v = np.transpose(v, (0, 2, 3, 1)).reshape(ic, -1)
                _set(params, ("depth_head", f"resize_{i}", name),
                     np.ascontiguousarray(v))
            elif i == 3:  # Conv2d stride 2
                if name == "kernel":
                    v = _conv_hwio(v)
                _set(params, ("depth_head", "resize_3", name), v)
            else:
                unused.append(key)  # resize_layers.2 is Identity
        elif (m := re.match(r"^depth_head\.scratch\.layer(\d)_rn\.weight$", key)):
            _set(params, ("depth_head", f"scratch_{m.group(1)}_rn", "kernel"), _conv_hwio(v))
        elif (m := rn.match(key)):
            n, rest = m.group(1), m.group(2)
            base = ("depth_head", f"refinenet{n}")
            if rest.startswith("resConfUnit"):
                rcu = "rcu1" if rest.startswith("resConfUnit1") else "rcu2"
                conv = rest.split(".")[1]  # conv1 / conv2
                name = "kernel" if rest.endswith("weight") else "bias"
                val = _conv_hwio(v) if name == "kernel" else v
                _set(params, base + (rcu, conv, name), val)
            elif rest == "out_conv.weight":
                _set(params, base + ("out_conv", "kernel"), _t(v[:, :, 0, 0]))
            elif rest == "out_conv.bias":
                _set(params, base + ("out_conv", "bias"), v)
            else:
                unused.append(key)
        elif key.startswith("depth_head.scratch.output_conv1."):
            name = "kernel" if key.endswith("weight") else "bias"
            val = _conv_hwio(v) if name == "kernel" else v
            _set(params, ("depth_head", "output_conv1", name), val)
        elif key.startswith("depth_head.scratch.output_conv2.0."):
            name = "kernel" if key.endswith("weight") else "bias"
            val = _conv_hwio(v) if name == "kernel" else v
            _set(params, ("depth_head", "output_conv2_0", name), val)
        elif key.startswith("depth_head.scratch.output_conv2.2."):
            name = "kernel" if key.endswith("weight") else "bias"
            val = _t(v[:, :, 0, 0]) if name == "kernel" else v
            _set(params, ("depth_head", "output_conv2_2", name), val)
        elif key.startswith("depth_head.readout_projects."):
            i = key.split(".")[2]
            name = "kernel" if key.endswith("weight") else "bias"
            val = _t(v) if name == "kernel" else v
            _set(params, ("depth_head", f"readout_{i}", name), val)
        else:
            unused.append(key)

    if unused and strict:
        raise KeyError(f"unmapped torch keys ({len(unused)}): {unused[:8]}...")
    return params


def _flatten(tree: Mapping, prefix: tuple[str, ...] = ()) -> dict[tuple[str, ...], np.ndarray]:
    flat = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            flat.update(_flatten(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = np.asarray(v)
    return flat


def params_to_torch(params: Mapping, cfg: ModelConfig) -> dict[str, np.ndarray]:
    """Export this framework's params as a reference-layout state dict
    (for safetensors interop with the PyTorch implementation)."""
    out: dict[str, np.ndarray] = {}
    p = cfg.encoder.patch_size
    for path, v in _flatten(params).items():
        # Encoder-block LoRA exports in the REFERENCE's own convention
        # (LoRALinear lora_A [r,in] / lora_B [out,r], ViT_DINO_reg.py:87-88)
        # so its loaders consume our adapters directly; the alpha-ratio fold
        # is inverted exactly (power of two). SSF stays framework-native
        # under 'adapters.': the reference applies it INSIDE its modules at
        # different tap points/dims (e.g. ssf_scale_1 on the 3C qkv output),
        # so no 1:1 torch mapping exists.
        if (
            path[-1] in ("lora_a", "lora_b")
            and len(path) >= 2 and path[0] == "pretrained"
            and str(path[1]).startswith("blocks_")
        ):
            i = str(path[1]).split("_")[1]
            mod = ".".join(path[2:-1])
            if path[-1] == "lora_a":
                out[f"pretrained.blocks.{i}.{mod}.lora_A"] = _t(v)
            else:
                out[f"pretrained.blocks.{i}.{mod}.lora_B"] = _t(
                    np.asarray(v) / _LORA_B_REF_TO_OURS
                )
            continue
        # other adapter params (SSF, any non-block LoRA) are framework-
        # native with no torch counterpart: exported verbatim under an
        # 'adapters.' namespace so adapter-only checkpoints stay complete
        # (torch loaders ignore the extra keys; torch_to_params restores
        # them exactly)
        if path[-1] in ("lora_a", "lora_b") or any(
            str(seg).startswith("ssf_") for seg in path
        ):
            out["adapters." + ".".join(path)] = v
            continue
        top = path[0]
        if top == "pretrained":
            if path[1] in ("cls_token", "pos_embed", "register_tokens"):
                out[f"pretrained.{path[1]}"] = v
            elif path[1] == "patch_embed":
                if path[2] == "kernel":
                    d = v.shape[-1]
                    w = v.reshape(p, p, -1, d).transpose(3, 2, 0, 1)
                    out["pretrained.patch_embed.proj.weight"] = np.ascontiguousarray(w)
                else:
                    out["pretrained.patch_embed.proj.bias"] = v
            elif path[1] == "norm":
                name = "weight" if path[2] == "scale" else "bias"
                out[f"pretrained.norm.{name}"] = v
            elif path[1] == "pos_conv":
                if path[-1] == "kernel":
                    out["pretrained.pos_conv.proj.0.weight"] = np.ascontiguousarray(
                        np.transpose(v, (3, 2, 0, 1))
                    )
                else:
                    out["pretrained.pos_conv.proj.0.bias"] = v
            elif path[1].startswith("blocks_"):
                i = path[1].split("_")[1]
                rest = path[2:]
                base = f"pretrained.blocks.{i}"
                if rest[0] in ("norm1", "norm2"):
                    name = "weight" if rest[1] == "scale" else "bias"
                    out[f"{base}.{rest[0]}.{name}"] = v
                elif rest[0] == "ls1_gamma":
                    out[f"{base}.ls1.gamma"] = v
                elif rest[0] == "ls2_gamma":
                    out[f"{base}.ls2.gamma"] = v
                else:
                    mod = ".".join(rest[:-1])
                    if rest[-1] == "kernel":
                        out[f"{base}.{mod}.weight"] = _t(v)
                    else:
                        out[f"{base}.{mod}.bias"] = v
        elif top == "depth_head":
            sub = path[1]
            leaf = path[-1]
            if sub.startswith("projects_"):
                i = sub.split("_")[1]
                if leaf == "kernel":
                    out[f"depth_head.projects.{i}.weight"] = _t(v)[:, :, None, None]
                else:
                    out[f"depth_head.projects.{i}.bias"] = v
            elif sub.startswith("resize_") and sub != "resize_3":
                i = int(sub.split("_")[1])
                f = 4 if i == 0 else 2
                if leaf == "kernel":
                    ic = v.shape[0]
                    w = v.reshape(ic, f, f, -1).transpose(0, 3, 1, 2)
                    out[f"depth_head.resize_layers.{i}.weight"] = np.ascontiguousarray(w)
                else:
                    out[f"depth_head.resize_layers.{i}.bias"] = v
            elif sub == "resize_3":
                if leaf == "kernel":
                    out["depth_head.resize_layers.3.weight"] = np.ascontiguousarray(
                        np.transpose(v, (3, 2, 0, 1))
                    )
                else:
                    out["depth_head.resize_layers.3.bias"] = v
            elif sub.startswith("scratch_"):
                n = sub.split("_")[1]
                out[f"depth_head.scratch.layer{n}_rn.weight"] = np.ascontiguousarray(
                    np.transpose(v, (3, 2, 0, 1))
                )
            elif sub.startswith("refinenet"):
                base = f"depth_head.scratch.{sub}"
                if path[2] in ("rcu1", "rcu2"):
                    unit = "resConfUnit1" if path[2] == "rcu1" else "resConfUnit2"
                    conv = path[3]
                    if leaf == "kernel":
                        out[f"{base}.{unit}.{conv}.weight"] = np.ascontiguousarray(
                            np.transpose(v, (3, 2, 0, 1))
                        )
                    else:
                        out[f"{base}.{unit}.{conv}.bias"] = v
                elif path[2] == "out_conv":
                    if leaf == "kernel":
                        out[f"{base}.out_conv.weight"] = _t(v)[:, :, None, None]
                    else:
                        out[f"{base}.out_conv.bias"] = v
            elif sub == "output_conv1":
                if leaf == "kernel":
                    out["depth_head.scratch.output_conv1.weight"] = np.ascontiguousarray(
                        np.transpose(v, (3, 2, 0, 1))
                    )
                else:
                    out["depth_head.scratch.output_conv1.bias"] = v
            elif sub == "output_conv2_0":
                if leaf == "kernel":
                    out["depth_head.scratch.output_conv2.0.weight"] = np.ascontiguousarray(
                        np.transpose(v, (3, 2, 0, 1))
                    )
                else:
                    out["depth_head.scratch.output_conv2.0.bias"] = v
            elif sub == "output_conv2_2":
                if leaf == "kernel":
                    out["depth_head.scratch.output_conv2.2.weight"] = _t(v)[:, :, None, None]
                else:
                    out["depth_head.scratch.output_conv2.2.bias"] = v
            elif sub.startswith("readout_"):
                i = sub.split("_")[1]
                if leaf == "kernel":
                    out[f"depth_head.readout_projects.{i}.0.weight"] = _t(v)
                else:
                    out[f"depth_head.readout_projects.{i}.0.bias"] = v
    # own the memory for pass-through leaves (mirror of _set's guard): a
    # caller fine-tuning torch params built on these arrays must not mutate
    # the source JAX tree
    return {
        k: (a if a.flags["OWNDATA"] else np.array(a, copy=True))
        for k, a in out.items()
    }


def load_safetensors_params(path: str, cfg: ModelConfig, strict: bool = True) -> dict:
    """Load a reference safetensors checkpoint into a flax param pytree."""
    from safetensors import numpy as st_numpy

    state = st_numpy.load_file(path)
    return torch_to_params(state, cfg, strict=strict)

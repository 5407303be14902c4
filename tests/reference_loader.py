"""Import the PyTorch reference from /root/reference for parity testing.

The reference is PUBLIC UNTRUSTED CONTENT used strictly as a numerical oracle
in tests — nothing from it ships in the framework. Some of its imports
(diffusers, timm, omegaconf, detectron2 engine) are unavailable/heavy here, so
we inject minimal stub modules before importing. Tests that need the
reference call ``load_reference_*`` and skip cleanly if torch or the reference
tree is unavailable.
"""
from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _install_stubs() -> None:
    class _ModelMixin:
        pass

    class _ConfigMixin:
        pass

    def _register_to_config(fn):
        return fn

    _stub("diffusers")
    _stub("diffusers.models")
    _stub("diffusers.models.modeling_utils", ModelMixin=_ModelMixin)
    _stub("diffusers.configuration_utils", ConfigMixin=_ConfigMixin,
          register_to_config=_register_to_config)
    timm = _stub("timm")
    timm_models = _stub("timm.models")
    _stub(
        "timm.models.vision_transformer",
        vit_large_patch16_224=None,
        vit_large_patch14_224=None,
    )
    timm.models = timm_models

    class _OmegaConf:
        pass

    _stub("omegaconf", OmegaConf=_OmegaConf)

    class _Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, sample):
            for t in self.transforms:
                sample = t(sample)
            return sample

    class _InterpolationMode:
        NEAREST = "nearest"
        BILINEAR = "bilinear"
        BICUBIC = "bicubic"

    _stub("torchvision")
    _stub(
        "torchvision.transforms",
        Compose=_Compose,
        Resize=None,
        ToTensor=None,
        InterpolationMode=_InterpolationMode,
    )
    _stub("torchvision.transforms.functional", resize=None)

    _format_code = lambda code, **kw: (code, True)  # noqa: E731
    _stub("yapf", FormatCode=_format_code)
    _stub("yapf.yapflib")
    _stub("yapf.yapflib.yapf_api", FormatCode=_format_code)
    try:
        import addict  # noqa: F401
    except ImportError:
        class _AddictDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        _stub("addict", Dict=_AddictDict)

    class _Comm:
        @staticmethod
        def get_rank():
            return 0

        @staticmethod
        def get_world_size():
            return 1

    _stub("detectron2")
    _stub("detectron2.utils", comm=_Comm)
    _stub("detectron2.utils.comm", get_rank=_Comm.get_rank,
          get_world_size=_Comm.get_world_size)
    _stub("detectron2.engine", launch=lambda *a, **k: None)


def _install_xformers_pattern_stub() -> None:
    """ViT_DINO.prepare_attn_bias imports xformers'
    ``local_2d_pattern`` at call time (ViT_DINO.py:1146). Provide the
    documented semantics (p-norm pairwise grid distance < threshold) so the
    windowed reference path runs without xformers."""
    import torch

    def local_2d_pattern(h, w, distance, p=2.0):
        coords = torch.stack(
            torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij"),
            dim=-1,
        ).reshape(-1, 2).float()
        d = torch.cdist(coords, coords, p=float(p))
        return d < distance

    xf = _stub("xformers")
    comp = _stub("xformers.components")
    attn = _stub("xformers.components.attention")
    ap = _stub(
        "xformers.components.attention.attention_patterns",
        local_2d_pattern=local_2d_pattern,
    )
    xf.components = comp
    comp.attention = attn
    attn.attention_patterns = ap


def load_reference_vit_dino():
    """Reference ViT_DINO module (incl. the windowed
    DinoWindowVisionTransformer). On CPU without xformers the MemEffAttention
    fallback asserts bias is None, so attention is routed through the
    bias-capable base ``Attention.forward`` (numerically identical,
    ViT_DINO.py:280-297 vs :300-320)."""
    _ensure_paths()
    _install_stubs()
    _install_xformers_pattern_stub()
    from distillanydepth.modeling.backbones.vit import ViT_DINO

    ViT_DINO.MemEffAttention.forward = ViT_DINO.Attention.forward
    return ViT_DINO


def load_reference_vit_dino_reg():
    """Reference ViT_DINO_reg module (DINOv2-with-registers encoders)."""
    _ensure_paths()
    _install_stubs()
    from distillanydepth.modeling.backbones.vit import ViT_DINO_reg

    return ViT_DINO_reg


def _ensure_paths() -> None:
    for p in (REFERENCE_ROOT, os.path.join(REFERENCE_ROOT, "tools")):
        if p not in sys.path:
            sys.path.insert(0, p)


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "distillanydepth"))


def load_reference_student():
    """Reference DepthAnythingV2 class (depth_anything_v2/dpt.py)."""
    _ensure_paths()
    _install_stubs()
    from distillanydepth.depth_anything_v2.dpt import DepthAnythingV2

    return DepthAnythingV2


def load_reference_teacher():
    """Reference DepthAnything/DAM class (modeling/archs/dam/dam.py)."""
    _ensure_paths()
    _install_stubs()
    from distillanydepth.modeling.archs.dam.dam import DepthAnything

    return DepthAnything


def load_reference_demo():
    """Reference demo.py module — the canonical HDN implementation."""
    _ensure_paths()
    _install_stubs()
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reference_demo", os.path.join(REFERENCE_ROOT, "demo.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_reference_eval_module():
    """Reference tools/evaluate.py (compute_depth_metrics oracle). Its model
    imports are broken in the reference itself (nonexistent depth_anything
    package, SURVEY.md §2.1) — stubbed so the metric functions import."""
    _ensure_paths()
    _install_stubs()
    _stub("depth_anything")
    _stub("depth_anything.dpt", DepthAnything=object, DepthAnythingV2=object)
    _stub("tqdm", tqdm=lambda x, **k: x)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reference_evaluate", os.path.join(REFERENCE_ROOT, "tools", "evaluate.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_reference_train_module():
    """Reference tools/train_distillation.py (losses + normalization)."""
    _ensure_paths()
    _install_stubs()
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reference_train",
        os.path.join(REFERENCE_ROOT, "tools", "train_distillation.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod

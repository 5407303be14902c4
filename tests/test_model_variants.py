"""Parity for the less-common model variants: SwiGLU FFN (ViT-g family) and
the cls-token readout DPT head."""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from distill_any_depth_tpu.configs import MODELS
from distill_any_depth_tpu.models.factory import create_model
from distill_any_depth_tpu.models.vit import SwiGLU
from distill_any_depth_tpu.utils.torch_interop import torch_to_params
from test_train import tiny_model_cfg

from reference_loader import reference_available, load_reference_student

pytestmark = pytest.mark.parity

torch = pytest.importorskip("torch")


def test_swiglu_parity_vs_reference_module():
    """SwiGLUFFNFused math incl. the 2/3*4d multiple-of-8 hidden rounding
    (dinov2_layers/swiglu_ffn.py:44-63)."""
    import importlib.util
    import sys

    sys.path.insert(0, "/root/reference")
    from distillanydepth.depth_anything_v2.dinov2_layers.swiglu_ffn import (
        SwiGLUFFNFused,
    )

    torch.manual_seed(0)
    dim = 48
    ref = SwiGLUFFNFused(in_features=dim, hidden_features=int(dim * 4)).eval()

    mod = SwiGLU(dim=dim, mlp_ratio=4.0)
    params = {
        "w12": {
            "kernel": ref.w12.weight.detach().numpy().T,
            "bias": ref.w12.bias.detach().numpy(),
        },
        "w3": {
            "kernel": ref.w3.weight.detach().numpy().T,
            "bias": ref.w3.bias.detach().numpy(),
        },
    }
    x = np.random.RandomState(0).randn(2, 7, dim).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_swiglu_model_forward_and_roundtrip():
    base = tiny_model_cfg("swiglu-tiny")
    enc = dataclasses.replace(base.encoder, ffn="swiglu")
    cfg = dataclasses.replace(base, encoder=enc)
    model = create_model(cfg)
    from distill_any_depth_tpu.models.factory import init_params
    from distill_any_depth_tpu.utils.torch_interop import params_to_torch

    params = init_params(model, 0, image_size=56)
    assert "w12" in params["pretrained"]["blocks_0"]["mlp"]
    d, f = model.apply({"params": params}, jnp.zeros((1, 56, 56, 3)))
    assert d.shape == (1, 56, 56)

    state = params_to_torch(params, cfg)
    assert any(k.endswith("mlp.w12.weight") for k in state)
    params2 = torch_to_params(state, cfg)
    d2, _ = model.apply({"params": params2}, jnp.zeros((1, 56, 56, 3)))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d2), atol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_clstoken_head_parity():
    """use_clstoken=True: readout MLPs concatenate the cls token into every
    patch token (dpt.py:116-122,153-156)."""
    torch.manual_seed(0)
    DepthAnythingV2 = load_reference_student()
    ref = DepthAnythingV2(encoder="vits", features=64,
                          out_channels=[48, 96, 192, 384], use_clstoken=True)
    ref.eval()

    cfg = dataclasses.replace(MODELS["depthanything-small"], use_clstoken=True)
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = torch_to_params(state, cfg)
    model = create_model(cfg, attn_impl="reference")

    x = np.random.RandomState(1).rand(1, 3, 112, 112).astype(np.float32)
    with torch.no_grad():
        want_depth, want_feat = ref(torch.from_numpy(x))
    got_depth, got_feat = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got_depth), want_depth.numpy()[:, 0],
                               rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_feat), want_feat.numpy(),
                               rtol=1e-3, atol=2e-4)

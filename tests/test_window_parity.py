"""Parity of the windowed high-resolution ViT vs the reference
DinoWindowVisionTransformer (ViT_DINO.py:875-1264): same weights -> same
forward_features output, and the attention window mask construction matches
the reference's xformers local_2d_pattern + corner/edge fixups
(ViT_DINO.py:1141-1178).
"""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from distill_any_depth_tpu.configs import EncoderConfig
from distill_any_depth_tpu.models.vit import DinoViT
from distill_any_depth_tpu.ops.window import local_window_bias
from distill_any_depth_tpu.utils.torch_interop import torch_to_params

from reference_loader import reference_available, load_reference_vit_dino

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.parity, pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)]


@pytest.fixture()
def cpu_cuda(monkeypatch):
    """The reference window-mask builder hard-codes ``.cuda()``
    (ViT_DINO.py:1150); run it on CPU."""
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)


def _small_window_vit(ViT_DINO, window_size=7):
    torch.manual_seed(0)
    vit = ViT_DINO.DinoWindowVisionTransformer(
        img_size=224,
        patch_size=14,
        embed_dim=96,
        depth=4,
        num_heads=4,
        mlp_ratio=4,
        init_values=1e-5,
        window_size=window_size,
    )
    vit.eval()
    return vit


def _encoder_cfg(window_size=7):
    return EncoderConfig(
        name="vitb_window_test",
        embed_dim=96,
        depth=4,
        num_heads=4,
        out_indices=(0, 1, 2, 3),
        base_img_size=224,
        init_values=1e-5,
        window_size=window_size,
        use_pos_conv=True,
        use_cls_token=False,
        final_taps=True,
    )


@pytest.mark.parametrize("hw", [(112, 112), (168, 112)])
def test_windowed_vit_forward_parity(cpu_cuda, hw):
    """forward_features path: window bias applied, GPE (coef=1) positional
    encoding, all-four-taps = final norm (ViT_DINO.py:1197-1264)."""
    ViT_DINO = load_reference_vit_dino()
    vit = _small_window_vit(ViT_DINO)

    state = {f"pretrained.{k}": v.detach().numpy() for k, v in vit.state_dict().items()}
    cfg = _encoder_cfg()
    params = torch_to_params(state, None)["pretrained"]

    rng = np.random.RandomState(3)
    x = rng.rand(1, 3, *hw).astype(np.float32)
    with torch.no_grad():
        feats, shape_info = vit.forward_features(torch.from_numpy(x))
    ref = feats[0].numpy()  # all four entries are the same final x_norm

    model = DinoViT(cfg, attn_impl="reference")
    taps, cls_tokens = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    for t in taps:
        np.testing.assert_allclose(np.asarray(t), ref, rtol=1e-4, atol=1e-5)


def test_windowed_pe_schedule_parity(cpu_cuda):
    """PE -> GPE blend at mid-schedule steps (ViT_DINO.py:1016-1019,
    1118-1139): step below start -> pure PE, mid ramp -> blended."""
    ViT_DINO = load_reference_vit_dino()
    vit = _small_window_vit(ViT_DINO)
    state = {f"pretrained.{k}": v.detach().numpy() for k, v in vit.state_dict().items()}
    cfg = _encoder_cfg()
    params = torch_to_params(state, None)["pretrained"]

    rng = np.random.RandomState(5)
    x = rng.rand(1, 3, 112, 112).astype(np.float32)
    xt = torch.from_numpy(x)
    model = DinoViT(cfg, attn_impl="reference")

    for step in (0, 1000, 6000, 12000):
        # current_step drives the blend coef inside forward_features
        # (prepare_tokens_with_masks default step=-1 reads it, :1106-1110).
        vit.current_step = step
        with torch.no_grad():
            ref = vit.forward_features(xt)[0][0].numpy()
        taps, _ = model.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            pe_step=jnp.asarray(step),
        )
        np.testing.assert_allclose(np.asarray(taps[0]), ref, rtol=1e-4, atol=1e-5)


def test_window_mask_matches_reference(cpu_cuda):
    """ops/window.local_window_bias center-clamp == the reference's
    local_2d_pattern + corner/edge fixups (ViT_DINO.py:1141-1178)."""
    ViT_DINO = load_reference_vit_dino()
    vit = _small_window_vit(ViT_DINO)
    for nh, nw in [(12, 8), (9, 9), (8, 13)]:
        ref_bias = vit.prepare_attn_bias((nh, nw)).numpy()[:, : nh * nw]
        ours = np.asarray(local_window_bias(nh, nw, 7, n_prefix=0))
        np.testing.assert_array_equal(ours == 0.0, ref_bias == 0.0)
        assert np.all(np.isneginf(ours[ours != 0.0]))


def test_windowed_interop_roundtrip(cpu_cuda):
    """pos_conv weights survive params -> torch -> params round-trip."""
    from distill_any_depth_tpu.utils.torch_interop import params_to_torch
    from distill_any_depth_tpu.configs import MODELS
    from distill_any_depth_tpu.models.factory import create_model, init_params
    import jax

    cfg = MODELS["depthanything-base-window"]
    model = create_model(cfg)
    params = init_params(model, 0, image_size=112)
    state = params_to_torch(params, cfg)
    assert "pretrained.pos_conv.proj.0.weight" in state
    assert state["pretrained.pos_conv.proj.0.weight"].shape == (768, 1, 37, 37)
    params2 = torch_to_params(state, cfg)
    flat1 = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    }
    flat2 = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(params2)
    }
    assert set(flat1) == set(flat2)
    for k in flat1:
        np.testing.assert_array_equal(np.asarray(flat1[k]), np.asarray(flat2[k]))

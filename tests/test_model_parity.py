"""Forward-pass parity of the JAX models vs the PyTorch reference.

The contract (SURVEY.md §4): same weights -> same depth map and features
within fp32 tolerance. Reference models are instantiated with their random
init, exported via state_dict, converted through utils/torch_interop, and
compared on fixed inputs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distill_any_depth_tpu.configs import MODELS
from distill_any_depth_tpu.models.factory import create_model
from distill_any_depth_tpu.utils.torch_interop import (
    params_to_torch,
    torch_to_params,
)

from reference_loader import (
    reference_available,
    load_reference_student,
    load_reference_teacher,
)

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.parity, pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)]


def _state_to_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _forward_ref(model, x_nchw):
    with torch.no_grad():
        depth, feat = model(torch.from_numpy(x_nchw))
    return depth.numpy(), feat.numpy()


@pytest.mark.parametrize("hw", [(196, 196), (196, 252)])
def test_student_vits_parity(hw):
    torch.manual_seed(0)
    DepthAnythingV2 = load_reference_student()
    ref = DepthAnythingV2(encoder="vits", features=64, out_channels=[48, 96, 192, 384])
    ref.eval()

    cfg = MODELS["depthanything-small"]
    params = torch_to_params(_state_to_numpy(ref), cfg)
    model = create_model(cfg, attn_impl="reference")

    rng = np.random.RandomState(42)
    x = rng.rand(2, 3, *hw).astype(np.float32)
    ref_depth, ref_feat = _forward_ref(ref, x)

    depth, feat = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    depth = np.asarray(depth)

    # reference depth is [B, 1, H, W]
    assert depth.shape == (2, *hw)
    np.testing.assert_allclose(depth, ref_depth[:, 0], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(feat), ref_feat, rtol=1e-3, atol=2e-4)


def test_student_roundtrip_export():
    """params -> torch state dict -> params is the identity."""
    cfg = MODELS["depthanything-small"]
    model = create_model(cfg)
    from distill_any_depth_tpu.models.factory import init_params

    params = init_params(model, 0, image_size=196)
    state = params_to_torch(params, cfg)
    params2 = torch_to_params(state, cfg)

    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2dict = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(params2)
    }
    assert len(flat1) == len(flat2dict)
    for path, v in flat1:
        np.testing.assert_array_equal(np.asarray(v), flat2dict[jax.tree_util.keystr(path)])


def test_teacher_vitl_parity():
    torch.manual_seed(0)
    DepthAnything = load_reference_teacher()
    ref = DepthAnything(
        encoder="vitl",
        features=256,
        out_channels=[256, 512, 1024, 1024],
        use_bn=False,
        use_clstoken=False,
        max_depth=150.0,
        mode="disparity",
        pretrain_type="dinov2",
        del_mask_token=False,
    )
    ref.eval()

    cfg = MODELS["depthanything-large"]
    params = torch_to_params(_state_to_numpy(ref), cfg)
    model = create_model(cfg, attn_impl="reference")

    rng = np.random.RandomState(7)
    x = rng.rand(1, 3, 112, 112).astype(np.float32)
    ref_depth, ref_feat = _forward_ref(ref, x)

    depth, feat = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(depth), ref_depth[:, 0], rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(feat), ref_feat, rtol=1e-3, atol=5e-4)


def _small_reg_vit(multi_output=False):
    from functools import partial
    from reference_loader import load_reference_vit_dino_reg

    ViT_DINO_reg = load_reference_vit_dino_reg()
    torch.manual_seed(0)
    ref = ViT_DINO_reg.DinoVisionTransformer(
        img_size=518,
        patch_size=14,
        embed_dim=96,
        depth=4,
        num_heads=4,
        mlp_ratio=4,
        block_fn=partial(
            ViT_DINO_reg.Block, attn_class=ViT_DINO_reg.MemEffAttention
        ),
        num_register_tokens=4,
        multi_output=multi_output,
    )
    ref.eval()
    return ref


def _reg_encoder_cfg(tap_norm=True):
    from distill_any_depth_tpu.configs import EncoderConfig

    return EncoderConfig(
        name="vits_reg_test",
        embed_dim=96,
        depth=4,
        num_heads=4,
        out_indices=(0, 1, 2, 3),
        num_register_tokens=4,
        init_values=1e-5,
        tap_norm=tap_norm,
    )


def test_registers_teacher_parity():
    """DINOv2-with-registers encoder (ViT_DINO_reg.py:754-1100): same weights
    -> same normed intermediate taps and cls tokens. The reference's
    get_intermediate_layers keeps the 4 register tokens in the patch output
    (:1081, out[:, 1:]) which crashes its own DPT-head reshape; this
    framework strips them — compare against ref outputs with registers
    stripped."""
    from distill_any_depth_tpu.models.vit import DinoViT

    ref = _small_reg_vit()
    state = {f"pretrained.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = _reg_encoder_cfg()
    params = torch_to_params(state, None)["pretrained"]

    rng = np.random.RandomState(11)
    x = rng.rand(2, 3, 98, 126).astype(np.float32)
    with torch.no_grad():
        outs = ref.get_intermediate_layers(
            torch.from_numpy(x), [0, 1, 2, 3], return_class_token=True, norm=True
        )

    model = DinoViT(cfg, attn_impl="reference")
    taps, cls_tokens = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    for (ref_patch, ref_cls), tap, cls in zip(outs, taps, cls_tokens):
        np.testing.assert_allclose(
            np.asarray(tap), ref_patch.numpy()[:, 4:], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(cls), ref_cls.numpy(), rtol=1e-4, atol=1e-5
        )


def test_registers_multi_output_parity():
    """multi_output=True (vit_giant2_reg, ViT_DINO_reg.py:1275-1294):
    evenly spaced PRE-norm taps (ViT_DINO_reg.py:1030-1038). tap_norm=False
    reproduces this; registers stripped as above."""
    from distill_any_depth_tpu.models.vit import DinoViT

    ref = _small_reg_vit(multi_output=True)
    state = {f"pretrained.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = _reg_encoder_cfg(tap_norm=False)
    params = torch_to_params(state, None)["pretrained"]

    rng = np.random.RandomState(13)
    x = rng.rand(1, 3, 112, 112).astype(np.float32)
    with torch.no_grad():
        feats, shape_info = ref.forward_features(torch.from_numpy(x))
    assert len(feats) == 4
    assert shape_info[-1] == 4  # num_register_tokens

    model = DinoViT(cfg, attn_impl="reference")
    taps, _ = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for ref_tap, tap in zip(feats, taps):
        np.testing.assert_allclose(
            np.asarray(tap), ref_tap.numpy()[:, 5:], rtol=1e-4, atol=1e-5
        )


def test_reg_models_constructible():
    """MODELS wiring: the reg teacher presets build and run end-to-end."""
    from distill_any_depth_tpu.models.factory import create_model, init_params

    cfg = MODELS["depthanything-large-reg"]
    assert cfg.encoder.num_register_tokens == 4
    model = create_model(cfg)
    params = init_params(model, 0, image_size=56)
    depth, feat = model.apply(
        {"params": params}, jnp.zeros((1, 56, 56, 3), jnp.float32)
    )
    assert depth.shape == (1, 56, 56)
    assert feat.shape == (1, 16, 1024)
    assert MODELS["depthanything-giant-reg"].encoder.tap_norm is False
    assert MODELS["depthanything-base-window"].encoder.use_pos_conv is True

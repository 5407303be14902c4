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

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference tree not mounted"
)


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

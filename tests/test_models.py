"""Reference-free model tests: shapes, jit, dtype policies."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distill_any_depth_tpu.configs import MODELS, model_config
from distill_any_depth_tpu.models.factory import create_model, init_params


def test_student_shapes_and_jit():
    cfg = MODELS["depthanything-small"]
    model = create_model(cfg)
    params = init_params(model, 0, image_size=98)

    x = jnp.zeros((2, 98, 126, 3), jnp.float32)
    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    depth, feat = fwd(params, x)
    assert depth.shape == (2, 98, 126)
    assert feat.shape == (2, (98 // 14) * (126 // 14), cfg.encoder.embed_dim)
    assert bool(jnp.all(depth >= 0))  # trailing ReLU


def test_non_multiple_of_patch_raises():
    cfg = MODELS["depthanything-small"]
    model = create_model(cfg)
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 100, 100, 3)))


def test_bf16_compute_close_to_fp32():
    cfg = MODELS["depthanything-small"]
    model32 = create_model(cfg)
    params = init_params(model32, 0, image_size=98)
    model16 = create_model(cfg, dtype=jnp.bfloat16)

    x = jnp.asarray(np.random.RandomState(0).rand(1, 98, 98, 3), jnp.float32)
    d32, _ = model32.apply({"params": params}, x)
    d16, _ = model16.apply({"params": params}, x.astype(jnp.bfloat16))
    # bf16 teacher path should track fp32 to a few percent relative scale
    scale = float(jnp.abs(d32).mean()) + 1e-6
    err = float(jnp.abs(d32 - d16.astype(jnp.float32)).mean()) / scale
    assert err < 0.1, err


def test_unknown_arch_raises():
    with pytest.raises(KeyError):
        model_config("depthanything-mega")


def test_remat_model_matches_plain():
    cfg = MODELS["depthanything-small"]
    plain = create_model(cfg)
    remat = create_model(cfg, remat=True)
    params = init_params(plain, 0, image_size=98)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 98, 98, 3), jnp.float32)
    d1, _ = plain.apply({"params": params}, x)
    d2, _ = remat.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=5e-6)

    # gradients flow through the remat model
    g = jax.grad(lambda p: jnp.mean(remat.apply({"params": p}, x)[0] ** 2))(params)
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_fused_conv3x3_matches_plain_conv():
    """FusedConv3x3's phase-packed stride-2 evaluation must be numerically
    the plain 3x3/s1 conv (same params; only the MXU scheduling differs)."""
    import flax.linen as nn

    from distill_any_depth_tpu.models.dpt import FusedConv3x3

    rng = np.random.RandomState(0)
    for h, w, ci, co in ((28, 56, 64, 32), (27, 28, 16, 8), (14, 14, 8, 130)):
        x = jnp.asarray(rng.rand(2, h, w, ci), jnp.float32)
        fused = FusedConv3x3(co)
        params = fused.init(jax.random.PRNGKey(0), x)["params"]
        plain = nn.Conv(co, (3, 3), padding=((1, 1), (1, 1)))
        ref = plain.apply({"params": params}, x)
        got = fused.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_packed_resize_tail_matches_plain():
    """resize_2d_packed + FusedConv3x3 on the packed layout must equal
    resize_2d + plain 3x3 conv (same params; the packed path only changes
    the blocking under which the GEMMs run)."""
    import flax.linen as nn

    from distill_any_depth_tpu.models.dpt import FusedConv3x3, merge_phases
    from distill_any_depth_tpu.ops.resize import resize_2d, resize_2d_packed

    rng = np.random.RandomState(1)
    for h, w, oh, ow, ci, co in ((16, 16, 28, 28, 24, 8), (12, 20, 28, 42, 8, 16)):
        x = jnp.asarray(rng.rand(2, h, w, ci), jnp.float32)
        fused = FusedConv3x3(co)
        params = fused.init(jax.random.PRNGKey(1), x)["params"]

        y_plain = resize_2d(x, (oh, ow), "bilinear", align_corners=True)
        ref = nn.Conv(co, (3, 3), padding=((1, 1), (1, 1))).apply(
            {"params": params}, y_plain
        )

        xp = resize_2d_packed(x, (oh, ow), "bilinear", align_corners=True)
        assert xp.shape == (2, oh // 2 + 1, ow // 2 + 1, 2, 2, ci)
        got = fused.apply({"params": params}, xp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        # keep_phases layout round-trips through merge_phases
        got_p = FusedConv3x3(co, keep_phases=True).apply({"params": params}, xp)
        np.testing.assert_allclose(
            np.asarray(merge_phases(got_p)), np.asarray(got), atol=0
        )


def test_packed_fusion_chain_matches_plain():
    """FeatureFusionBlock(packed_output) -> FusedConv3x3(keep_phases) ->
    resize_2d_packed(packed_input) -> FusedConv3x3 must equal the plain
    spatial chain (same params): the out_conv/upsample swap is exact because
    a 1x1 conv commutes with bilinear resampling."""
    from distill_any_depth_tpu.models.dpt import (
        FeatureFusionBlock, FusedConv3x3, merge_phases,
    )
    from distill_any_depth_tpu.ops.resize import resize_2d, resize_2d_packed

    rng = np.random.RandomState(2)
    feat, co1, co2 = 32, 16, 8
    x = jnp.asarray(rng.rand(2, 8, 10, feat), jnp.float32)
    skip = jnp.asarray(rng.rand(2, 8, 10, feat), jnp.float32)
    oh, ow = 28, 42  # 14 * (2, 3): the patch-14 head target shape family

    plain_ffb = FeatureFusionBlock(feat)
    params = plain_ffb.init(jax.random.PRNGKey(2), x, x)["params"]
    conv1 = FusedConv3x3(co1)
    p1 = conv1.init(jax.random.PRNGKey(3), jnp.zeros((1, 4, 4, feat)))["params"]
    conv2 = FusedConv3x3(co2)
    p2 = conv2.init(jax.random.PRNGKey(4), jnp.zeros((1, 4, 4, co1)))["params"]

    y = plain_ffb.apply({"params": params}, x, skip)
    y = conv1.apply({"params": p1}, y)
    y = resize_2d(y, (oh, ow), "bilinear", align_corners=True)
    ref = conv2.apply({"params": p2}, y)

    y = FeatureFusionBlock(feat, packed_output=True).apply({"params": params}, x, skip)
    assert y.ndim == 6
    y = FusedConv3x3(co1, keep_phases=True).apply({"params": p1}, y)
    y = resize_2d_packed(y, (oh, ow), "bilinear", align_corners=True,
                         packed_input=True)
    got = merge_phases(
        FusedConv3x3(co2, keep_phases=True).apply({"params": p2}, y)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

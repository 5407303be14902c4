"""Fused DPT-tail Pallas kernel (ops/dpt_tail) correctness.

The kernel fuses the reference head's whole tail chain
(distillanydepth/depth_anything_v2/dpt.py:141-182: refinenet1's 2x
upsample, output_conv1, the align_corners upsample to patch-grid
resolution, output_conv2 + ReLU + 1x1) into one VMEM-resident program.
These tests pin (1) kernel-vs-spatial-chain parity across shapes, (2)
model-level parity + parameter-structure equality between the fused and
packed DPTHead branches, and (3) the automatic fallback on unsupported
shapes (ci % 128 != 0).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distill_any_depth_tpu.ops.dpt_tail import (
    fused_dpt_tail,
    fused_dpt_tail_v2,
    fused_tail_supported,
    fused_tail_supported_v2,
    tail_reference,
)


def _params(rng, ci, cm):
    return dict(
        k1=jnp.asarray(rng.randn(3, 3, ci, cm) * 0.05, jnp.float32),
        b1=jnp.asarray(rng.randn(cm) * 0.1, jnp.float32),
        k2=jnp.asarray(rng.randn(3, 3, cm, 32) * 0.05, jnp.float32),
        b2=jnp.asarray(rng.randn(32) * 0.1, jnp.float32),
        kd=jnp.asarray(rng.randn(32, 1) * 0.2, jnp.float32),
        bd=jnp.asarray(rng.randn(1) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize(
    "ht,wt,ci,cm,oh,ow,trailing",
    [
        (8, 8, 128, 64, 28, 28, True),
        (16, 12, 128, 64, 56, 42, False),  # non-square, teacher-style tail
        (14, 14, 256, 128, 98, 98, True),  # ViT-L channel widths
    ],
)
def test_kernel_matches_spatial_chain(ht, wt, ci, cm, oh, ow, trailing):
    rng = np.random.RandomState(0)
    p = _params(rng, ci, cm)
    t = jnp.asarray(rng.randn(2, ht, wt, ci) * 0.5, jnp.float32)
    assert fused_tail_supported(ht, wt, ci, oh, ow, cm, 32, 1, 4)
    ref = tail_reference(t, (oh, ow), trailing_relu=trailing,
                         dtype=jnp.float32, **p)
    got = fused_dpt_tail(t, (oh, ow), trailing_relu=trailing,
                         interpret=True, **p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-6)


@pytest.mark.parametrize(
    "ht,wt,ci,cm,oh,ow,trailing",
    [
        (8, 8, 128, 64, 28, 28, True),
        (16, 12, 128, 64, 56, 42, False),  # non-square, teacher-style tail
        (14, 14, 256, 128, 98, 98, True),  # ViT-L channel widths
        (16, 16, 128, 64, 56, 56, True),   # oh % ty == 0 divisor path
    ],
)
def test_v2_kernel_matches_spatial_chain(ht, wt, ci, cm, oh, ow, trailing):
    rng = np.random.RandomState(0)
    p = _params(rng, ci, cm)
    t = jnp.asarray(rng.randn(2, ht, wt, ci) * 0.5, jnp.float32)
    assert fused_tail_supported_v2(ht, wt, ci, oh, ow, cm, 32, 1, 4)
    ref = tail_reference(t, (oh, ow), trailing_relu=trailing,
                         dtype=jnp.float32, **p)
    got = fused_dpt_tail_v2(t, (oh, ow), trailing_relu=trailing,
                            interpret=True, **p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-6)


def test_v2_forced_tile_matches_auto():
    """Masked final tile (oh % ty != 0) must still be exact."""
    rng = np.random.RandomState(3)
    p = _params(rng, 128, 64)
    t = jnp.asarray(rng.randn(1, 10, 10, 128) * 0.5, jnp.float32)
    ref = tail_reference(t, (70, 70), trailing_relu=True,
                         dtype=jnp.float32, **p)
    got = fused_dpt_tail_v2(t, (70, 70), trailing_relu=True,
                            interpret=True, force_ty=16, **p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=5e-6)


def test_unsupported_shapes_gate():
    # ci % 128 != 0 (ViT-S head width 64): must be gated out.
    assert not fused_tail_supported(8, 8, 64, 28, 28, 32, 32, 1, 4)
    # multi-channel heads (teacher wo_relu variants) are gated out.
    assert not fused_tail_supported(8, 8, 128, 28, 28, 64, 32, 3, 4)


@pytest.mark.slow
def test_model_level_parity_and_param_structure():
    from distill_any_depth_tpu.models.factory import create_model, init_params

    m0 = create_model("depthanything-base", dtype=jnp.float32)
    m1 = create_model("depthanything-base", dtype=jnp.float32,
                      fused_tail=True)
    p0 = init_params(m0, 0, image_size=112)
    p1 = init_params(m1, 0, image_size=112)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool(jnp.array_equal(a, b)),
                               p0, p1))
    x = jnp.asarray(np.random.RandomState(1).rand(2, 112, 112, 3),
                    jnp.float32)
    d0, f0 = m0.apply({"params": p0}, x)
    d1, f1 = m1.apply({"params": p0}, x)
    assert float(jnp.max(jnp.abs(d0 - d1))) < 5e-6
    assert bool(jnp.array_equal(f0, f1))


@pytest.mark.slow
def test_fused_flag_falls_back_on_small_head():
    """ViT-S head (features 64) fails the ci gate: the flag must be a
    no-op, not an error, and params must stay loadable either way."""
    from distill_any_depth_tpu.models.factory import create_model, init_params

    m0 = create_model("depthanything-small", dtype=jnp.float32)
    m1 = create_model("depthanything-small", dtype=jnp.float32,
                      fused_tail=True)
    p = init_params(m0, 0, image_size=112)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 112, 112, 3),
                    jnp.float32)
    d0, _ = m0.apply({"params": p}, x)
    d1, _ = m1.apply({"params": p}, x)
    assert bool(jnp.array_equal(d0, d1))

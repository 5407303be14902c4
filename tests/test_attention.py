"""Attention op tests: flash kernel (interpret mode on CPU) vs the einsum
reference, including padding, bias, and gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distill_any_depth_tpu.ops.attention import mha_reference
from distill_any_depth_tpu.ops.flash_attention import mha_flash


def _qkv(b=2, n=197, h=3, d=64, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(b, n, h, d).astype(np.float32) * 0.2)  # noqa: E731
    return mk(), mk(), mk()


@pytest.mark.parametrize("n", [64, 197, 785])
def test_flash_matches_reference(n):
    q, k, v = _qkv(n=n)
    ref = mha_reference(q, k, v)
    out = mha_flash(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_flash_with_bias():
    q, k, v = _qkv(n=130)
    rng = np.random.RandomState(1)
    bias = jnp.asarray(rng.randn(130, 130).astype(np.float32))
    ref = mha_reference(q, k, v, bias=bias[None, None])
    out = mha_flash(q, k, v, bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_flash_gradients_match():
    q, k, v = _qkv(n=100, b=1, h=2)

    def loss_flash(q, k, v):
        return jnp.sum(mha_flash(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_flash_bf16():
    q, k, v = _qkv(n=256)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = mha_reference(q, k, v)
    out = mha_flash(q, k, v, interpret=True)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert err < 0.05, err


def test_segment_bias_blocks_cross_attention():
    """Packed variable-length sequences: tokens attend only within their
    segment, matching separate per-sequence attention."""
    from distill_any_depth_tpu.ops.window import segment_bias

    rng = np.random.RandomState(3)
    n1, n2, h, d = 5, 7, 2, 16
    q1, k1, v1 = (jnp.asarray(rng.randn(1, n1, h, d).astype(np.float32)) for _ in range(3))
    q2, k2, v2 = (jnp.asarray(rng.randn(1, n2, h, d).astype(np.float32)) for _ in range(3))

    packed = lambda a, b: jnp.concatenate([a, b], axis=1)  # noqa: E731
    seg = jnp.asarray([0] * n1 + [1] * n2)
    bias = segment_bias(seg)
    out = mha_reference(packed(q1, q2), packed(k1, k2), packed(v1, v2),
                        bias=bias[None, None])
    ref1 = mha_reference(q1, k1, v1)
    ref2 = mha_reference(q2, k2, v2)
    np.testing.assert_allclose(np.asarray(out[:, :n1]), np.asarray(ref1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, n1:]), np.asarray(ref2),
                               rtol=1e-5, atol=1e-6)

    # same through the Pallas kernel
    out_fl = mha_flash(packed(q1, q2), packed(k1, k2), packed(v1, v2),
                       bias=bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out_fl), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_flash_backward_multiblock_accumulation():
    """n > q_block exercises dk/dv accumulation across the q grid."""
    q, k, v = _qkv(n=300, b=1, h=2, seed=5)

    def loss_flash(q, k, v):
        return jnp.sum(mha_flash(q, k, v, interpret=True) * jnp.cos(q))

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) * jnp.cos(q))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=f"d{name}")


def test_flash_bias_gradients_match():
    """Constant-bias (window mask) backward stays in Pallas: q/k/v grads
    match the einsum reference; multi-q-block grid exercised (n=300 ->
    q_block 256 + padding)."""
    from distill_any_depth_tpu.ops.window import local_window_bias

    q, k, v = _qkv(n=300, b=1, h=2, seed=4)
    bias = local_window_bias(10, 30, window=5, n_prefix=0)

    def loss_flash(q, k, v):
        return jnp.sum(mha_flash(q, k, v, bias=bias, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, bias=bias[None, None]) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_flash_trainable_bias_gradient():
    """A *differentiated* bias takes the einsum fallback and gets a real
    (non-zero) dbias matching the reference."""
    q, k, v = _qkv(n=70, b=1, h=2, seed=5)
    rng = np.random.RandomState(6)
    bias = jnp.asarray(rng.randn(70, 70).astype(np.float32) * 0.1)

    def loss_flash(bias):
        return jnp.sum(mha_flash(q, k, v, bias=bias, interpret=True) ** 2)

    def loss_ref(bias):
        return jnp.sum(mha_reference(q, k, v, bias=bias[None, None]) ** 2)

    db_f = jax.grad(loss_flash)(bias)
    db_r = jax.grad(loss_ref)(bias)
    assert float(jnp.abs(db_f).max()) > 0
    np.testing.assert_allclose(np.asarray(db_f), np.asarray(db_r), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("gh,gw,window,qmult", [(9, 9, 3, 1), (14, 14, 7, 2)])
def test_banded_window_matches_dense(gh, gw, window, qmult):
    """The banded (FLOP-skipping) windowed forward must match the dense
    kernel/einsum with the same local-window bias, n_prefix=0."""
    from distill_any_depth_tpu.ops import flash_attention as fa
    from distill_any_depth_tpu.ops.window import local_window_bias

    n = gh * gw
    b, h, d = 2, 4, 32
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, n, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, n, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, n, h, d), jnp.float32)
    bias = local_window_bias(gh, gw, window, n_prefix=0)

    ref = mha_reference(q, k, v, bias[None, None])
    # exercise several q-block sizes relative to the band span; drop the
    # min-seq gate so the banded kernel actually runs at test sizes
    orig = fa._pick_tiling
    orig_min = fa._BANDED_MIN_SEQ
    fa._pick_tiling = lambda *a, **kw: (2, 128 * qmult)
    fa._BANDED_MIN_SEQ = 0
    try:
        banded = mha_flash(q, k, v, bias, interpret=True, band=(gw, window))
    finally:
        fa._pick_tiling = orig
        fa._BANDED_MIN_SEQ = orig_min
    np.testing.assert_allclose(
        np.asarray(banded), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("gh,gw,window", [(9, 9, 3), (14, 14, 7)])
def test_banded_window_gradients_match(gh, gw, window):
    """The banded backward (dq over the sliding band, dk/dv over the
    inverse band) must match einsum gradients under the same window mask."""
    from distill_any_depth_tpu.ops import flash_attention as fa
    from distill_any_depth_tpu.ops.window import local_window_bias

    n = gh * gw
    b, h, d = 1, 2, 16
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, n, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, n, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, n, h, d), jnp.float32)
    bias = local_window_bias(gh, gw, window, n_prefix=0)

    def loss_banded(q, k, v):
        return jnp.sum(
            mha_flash(q, k, v, bias, interpret=True, band=(gw, window)) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, bias[None, None]) ** 2)

    orig_min = fa._BANDED_MIN_SEQ
    fa._BANDED_MIN_SEQ = 0
    try:
        gb = jax.grad(loss_banded, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa._BANDED_MIN_SEQ = orig_min
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, r in zip(gb, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("n", [64, 197, 785])
def test_packed_flash_matches_reference(n):
    """mha_flash_packed consumes the fused-QKV GEMM layout [B,N,3HD]
    directly; outputs must match the unpacked reference."""
    from distill_any_depth_tpu.ops.flash_attention import mha_flash_packed

    b, h, d = 2, 4, 64  # C=256: two 128-lane head groups
    rng = np.random.RandomState(3)
    qkv = jnp.asarray(rng.randn(b, n, 3 * h * d).astype(np.float32) * 0.2)
    qkv5 = qkv.reshape(b, n, 3, h, d)
    ref = mha_reference(qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2])
    out = mha_flash_packed(qkv, h, interpret=True)
    assert out.shape == (b, n, h * d)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref.reshape(b, n, h * d)),
        rtol=1e-4, atol=1e-5,
    )


def test_packed_flash_gradients_match():
    from distill_any_depth_tpu.ops.flash_attention import mha_flash_packed

    b, n, h, d = 2, 150, 4, 32  # C=128: one lane group, 4 sub-head slices
    rng = np.random.RandomState(4)
    qkv = jnp.asarray(rng.randn(b, n, 3 * h * d).astype(np.float32) * 0.2)

    def loss_packed(qkv):
        return jnp.sum(mha_flash_packed(qkv, h, interpret=True) ** 2)

    def loss_ref(qkv):
        q5 = qkv.reshape(b, n, 3, h, d)
        return jnp.sum(mha_reference(q5[:, :, 0], q5[:, :, 1], q5[:, :, 2]) ** 2)

    gp = jax.grad(loss_packed)(qkv)
    gr = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=2e-3, atol=2e-3)


def test_packed_dispatch_falls_back_off_tpu():
    """multi_head_attention_packed must agree with the unpacked dispatch in
    every configuration reachable from models/vit.Attention."""
    from distill_any_depth_tpu.ops.attention import multi_head_attention_packed
    from distill_any_depth_tpu.ops.window import local_window_bias

    b, n, h, d = 2, 81, 3, 16
    rng = np.random.RandomState(5)
    qkv = jnp.asarray(rng.randn(b, n, 3 * h * d).astype(np.float32) * 0.2)
    qkv5 = qkv.reshape(b, n, 3, h, d)
    # no bias
    ref = mha_reference(qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2])
    out = multi_head_attention_packed(qkv, h)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref.reshape(b, n, h * d)),
                               rtol=1e-4, atol=1e-5)
    # window bias (the windowed-teacher configuration)
    bias = local_window_bias(9, 9, 3, n_prefix=0)
    ref_b = mha_reference(qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2],
                          bias[None, None])
    out_b = multi_head_attention_packed(qkv, h, bias=bias)
    np.testing.assert_allclose(np.asarray(out_b),
                               np.asarray(ref_b.reshape(b, n, h * d)),
                               rtol=1e-4, atol=1e-5)


def test_mha_flash_packed_n_valid_masks_pad_rows():
    """n_valid masking: a padded [B, N8, 3C] qkv with garbage pad rows must
    produce, on the real rows, exactly the output of the unpadded call —
    and gradients must flow only to the real rows (the encoder-level
    8-aligned padding of models/vit.DinoViT rides on this)."""
    from distill_any_depth_tpu.ops.flash_attention import mha_flash_packed

    b, n, h, d = 2, 13, 4, 32
    n8 = 16
    rng = np.random.RandomState(7)
    qkv = jnp.asarray(rng.randn(b, n, 3 * h * d), jnp.float32)
    garbage = jnp.asarray(100.0 * rng.randn(b, n8 - n, 3 * h * d), jnp.float32)
    qkv_p = jnp.concatenate([qkv, garbage], axis=1)

    ref = mha_flash_packed(qkv, h, interpret=True)
    out = mha_flash_packed(qkv_p, h, interpret=True, n_valid=n)
    np.testing.assert_allclose(np.asarray(out[:, :n]), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    # grads: cotangent zero on pad rows (the DinoViT contract) -> dqkv of the
    # real rows matches the unpadded call, pad rows get exactly zero
    def loss_p(x):
        o = mha_flash_packed(x, h, interpret=True, n_valid=n)
        return jnp.sum(jnp.sin(o[:, :n]))

    def loss_u(x):
        return jnp.sum(jnp.sin(mha_flash_packed(x, h, interpret=True)))

    gp = jax.grad(loss_p)(qkv_p)
    gu = jax.grad(loss_u)(qkv)
    np.testing.assert_allclose(np.asarray(gp[:, :n]), np.asarray(gu),
                               rtol=1e-5, atol=1e-6)
    assert float(jnp.abs(gp[:, n:]).max()) == 0.0


def test_mha_flash_packed_n_valid_pad_score_is_max():
    """Adversarial case for the kzero pad handling: zeroed pad keys give pad
    scores of exactly 0, so when every REAL score in a row is negative the
    softmax max m comes from a PAD column. The closed-form denominator
    correction (denom - n_pad*exp(-m)) must stay exact there, not just when
    real scores dominate. Construct q = -k/|k|^2-ish so all real dots are
    negative."""
    from distill_any_depth_tpu.ops.flash_attention import mha_flash_packed

    b, n, h, d = 1, 12, 4, 32
    n8 = 16
    rng = np.random.RandomState(11)
    # strictly positive keys, strictly negative queries: every real dot is
    # negative in every head, so m == 0 comes from the zeroed pad columns
    k = 0.5 + rng.rand(n, h * d)
    q = -(0.5 + rng.rand(n, h * d))
    v = rng.randn(n, h * d)
    qkv = jnp.asarray(np.concatenate([q, k, v], -1)[None], jnp.float32)
    scores = (q.reshape(n, h, d).transpose(1, 0, 2)
              @ k.reshape(n, h, d).transpose(1, 2, 0)) / np.sqrt(d)
    assert scores.max() < 0, "construction failed: need all-negative scores"

    garbage = jnp.asarray(50.0 * rng.randn(1, n8 - n, 3 * h * d), jnp.float32)
    qkv_p = jnp.concatenate([qkv, garbage], axis=1)
    ref = mha_flash_packed(qkv, h, interpret=True)
    out = mha_flash_packed(qkv_p, h, interpret=True, n_valid=n)
    np.testing.assert_allclose(np.asarray(out[:, :n]), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_packed_dispatch_n_valid_fallback_slices():
    """The einsum fallback of multi_head_attention_packed slices off the pad
    rows and zero-pads the output back."""
    from distill_any_depth_tpu.ops.attention import multi_head_attention_packed

    b, n, h, d = 2, 11, 2, 16
    rng = np.random.RandomState(3)
    qkv = jnp.asarray(rng.randn(b, n, 3 * h * d), jnp.float32)
    qkv_p = jnp.pad(qkv, ((0, 0), (0, 5), (0, 0)), constant_values=7.0)
    ref = multi_head_attention_packed(qkv, h, impl="reference")
    out = multi_head_attention_packed(qkv_p, h, impl="reference", n_valid=n)
    np.testing.assert_allclose(np.asarray(out[:, :n]), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    assert float(jnp.abs(out[:, n:]).max()) == 0.0

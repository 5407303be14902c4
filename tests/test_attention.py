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

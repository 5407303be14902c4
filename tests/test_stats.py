"""ops/stats bisection-select order statistics vs numpy-sort ground truth.

The select must return the exact element a stable sort would pick (torch
median/nanquantile semantics), including negatives, ties, +-0.0, empty
masks, and bf16 inputs — and its gradient must land on exactly one source
element per row.
"""
import numpy as np

import jax
import jax.numpy as jnp

from distill_any_depth_tpu.ops.stats import (
    masked_median,
    masked_quantile,
    median_all,
)


def _np_masked_median(x, m):
    out = np.zeros(x.shape[:-1], np.float32)
    flat_x = x.reshape(-1, x.shape[-1])
    flat_m = m.reshape(-1, x.shape[-1])
    for i in range(flat_x.shape[0]):
        v = np.sort(flat_x[i][flat_m[i]])
        out.reshape(-1)[i] = v[(len(v) - 1) // 2] if len(v) else 0.0
    return out


def test_masked_median_matches_sort():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 3, 501).astype(np.float32) * 10
    # inject ties, negatives, zeros of both signs
    x[0, 0, :50] = 1.5
    x[1, 1, :30] = -0.0
    x[1, 1, 30:60] = 0.0
    m = rng.rand(4, 3, 501) > 0.3
    m[2, 2] = False  # empty row -> 0.0
    got = np.asarray(masked_median(jnp.asarray(x), jnp.asarray(m)))
    np.testing.assert_array_equal(got, _np_masked_median(x, m))


def test_median_all_matches_sort():
    rng = np.random.RandomState(1)
    for n in (1, 2, 500, 501):
        x = rng.randn(5, n).astype(np.float32)
        ref = np.sort(x, axis=-1)[:, (n - 1) // 2]
        got = np.asarray(median_all(jnp.asarray(x)))
        np.testing.assert_array_equal(got, ref)


def test_masked_quantile_matches_numpy():
    rng = np.random.RandomState(2)
    x = rng.randn(6, 301).astype(np.float32)
    m = rng.rand(6, 301) > 0.4
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        got = np.asarray(masked_quantile(jnp.asarray(x), jnp.asarray(m), q))
        for i in range(6):
            ref = np.quantile(x[i][m[i]].astype(np.float64), q)
            np.testing.assert_allclose(got[i], ref, rtol=1e-6, atol=1e-6)
    # empty mask -> NaN
    m0 = np.zeros_like(m)
    assert np.isnan(np.asarray(masked_quantile(jnp.asarray(x), jnp.asarray(m0), 0.5))).all()


def test_median_gradient_is_one_element_scatter():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(3, 101).astype(np.float32))
    m = jnp.asarray(rng.rand(3, 101) > 0.2)
    g = jax.grad(lambda x: jnp.sum(masked_median(x, m)))(x)
    g = np.asarray(g)
    # exactly one unit gradient per row, at the median element
    assert (np.abs(g).sum(axis=-1) == 1.0).all()
    med = np.asarray(masked_median(x, m))
    for i in range(3):
        j = int(np.abs(g[i]).argmax())
        assert np.asarray(x)[i, j] == med[i]


def test_median_bf16_input():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 99), jnp.bfloat16)
    m = jnp.ones((2, 99), bool)
    ref = np.sort(np.asarray(x, np.float32), axis=-1)[:, 49]
    got = np.asarray(masked_median(x, m), np.float32)
    np.testing.assert_array_equal(got, ref)


def test_fused_select_matches_jnp_path():
    """Long rows dispatch to the Pallas fused-bisection kernel (one HBM
    pass); it must pick the identical element as the 33-pass jnp path."""
    from distill_any_depth_tpu.ops import stats

    rng = np.random.RandomState(0)
    n = stats._PALLAS_MIN_COLS + 137  # odd, non-128-multiple tail
    x = jnp.asarray(rng.randn(3, n).astype(np.float32))
    mask = jnp.asarray(rng.rand(3, n) > 0.3)

    med_fused = stats.masked_median(x, mask)
    q_fused = stats.masked_quantile(x, mask, 0.37)
    orig = stats._PALLAS_MIN_COLS
    stats._PALLAS_MIN_COLS = 1 << 60  # force the jnp path
    try:
        med_jnp = stats.masked_median(x, mask)
        q_jnp = stats.masked_quantile(x, mask, 0.37)
    finally:
        stats._PALLAS_MIN_COLS = orig
    np.testing.assert_array_equal(np.asarray(med_fused), np.asarray(med_jnp))
    np.testing.assert_array_equal(np.asarray(q_fused), np.asarray(q_jnp))

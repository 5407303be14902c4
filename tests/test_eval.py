"""Evaluation harness tests: metric parity vs the reference formulas and the
mean-ratio alignment protocol (tools/evaluate.py:71-155)."""
import numpy as np
import pytest

import jax.numpy as jnp

from distill_any_depth_tpu.eval.metrics import (
    METRIC_KEYS,
    batched_depth_metrics,
    compute_depth_metrics,
)


def _reference_protocol(pred, gt):
    """The reference per-sample protocol, straight from the formulas:
    mask = gt>0, mean-ratio alignment, then metrics."""
    mask = gt > 0
    pred = pred * (gt[mask].mean() / pred[mask].mean())
    p, g = pred[mask], gt[mask]
    thresh = np.maximum(g / p, p / g)
    return {
        "abs_rel": np.mean(np.abs(g - p) / g),
        "abs_diff": np.mean(np.abs(g - p)),
        "sq_rel": np.mean((g - p) ** 2 / g),
        "rmse": np.sqrt(np.mean((g - p) ** 2)),
        "rmse_log": np.sqrt(np.mean((np.log(g) - np.log(p)) ** 2)),
        "a1": np.mean(thresh < 1.25),
        "a2": np.mean(thresh < 1.25**2),
        "a3": np.mean(thresh < 1.25**3),
    }


def test_batched_matches_per_sample():
    rng = np.random.RandomState(0)
    pred = rng.rand(3, 16, 16).astype(np.float32) + 0.1
    gt = rng.rand(3, 16, 16).astype(np.float32)
    gt[gt < 0.3] = 0.0  # invalid pixels

    batched, valid = batched_depth_metrics(pred, gt)
    assert valid.all()
    for i in range(3):
        ref = _reference_protocol(pred[i].copy(), gt[i])
        for k in METRIC_KEYS:
            np.testing.assert_allclose(batched[k][i], ref[k], rtol=1e-4,
                                       err_msg=f"{k}[{i}]")


def test_perfect_prediction():
    rng = np.random.RandomState(1)
    gt = rng.rand(2, 8, 8).astype(np.float32) + 0.5
    batched, valid = batched_depth_metrics(gt * 3.0, gt)  # scale-off but aligned away
    assert valid.all()
    np.testing.assert_allclose(batched["abs_rel"], 0.0, atol=1e-5)
    np.testing.assert_allclose(batched["a1"], 1.0)


def test_empty_mask_sample_flagged_invalid():
    pred = np.ones((2, 8, 8), np.float32)
    gt = np.ones((2, 8, 8), np.float32)
    gt[1] = 0.0
    _, valid = batched_depth_metrics(pred, gt)
    assert valid[0] and not valid[1]


def test_compute_depth_metrics_empty():
    m = compute_depth_metrics(np.ones((4, 4)), np.zeros((4, 4)))
    assert all(np.isnan(v) for v in m.values())


def test_metrics_match_reference_module():
    """Direct oracle check against the reference compute_depth_metrics
    (tools/evaluate.py:71-114) and its mean-ratio alignment (:135-144)."""
    from reference_loader import reference_available, load_reference_eval_module

    if not reference_available():
        pytest.skip("reference tree not mounted")
    ref = load_reference_eval_module()

    rng = np.random.RandomState(7)
    pred = rng.rand(2, 20, 20).astype(np.float32) + 0.05
    gt = rng.rand(2, 20, 20).astype(np.float32)
    gt[gt < 0.2] = 0.0

    batched, valid = batched_depth_metrics(pred, gt)
    for i in range(2):
        mask = gt[i] > 0
        p = pred[i] * (gt[i][mask].mean() / pred[i][mask].mean())
        ref_m = ref.compute_depth_metrics(p, gt[i], mask)
        for k in METRIC_KEYS:
            np.testing.assert_allclose(batched[k][i], ref_m[k], rtol=1e-4,
                                       err_msg=f"{k}[{i}]")

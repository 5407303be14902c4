"""Tests for window bias, profiling, visualization, and the loss-weight
tuner."""
import dataclasses
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distill_any_depth_tpu.configs import (
    EncoderConfig,
    LossConfig,
    OptimizerConfig,
    TrainConfig,
)
from distill_any_depth_tpu.ops.attention import mha_reference
from distill_any_depth_tpu.ops.window import local_window_bias
from distill_any_depth_tpu.utils.profiling import StepTimer
from distill_any_depth_tpu.utils.visualize import plot_history, visualize_depth_predictions
from test_train import tiny_model_cfg


def test_window_bias_structure():
    bias = np.asarray(local_window_bias(4, 4, window=3, n_prefix=1))
    n = 1 + 16
    assert bias.shape == (n, n)
    # cls row/col fully open
    assert np.all(bias[0] == 0) and np.all(bias[:, 0] == 0)
    # corner completion: token (0,0) [index 1] gets the full shifted 3x3
    # window centered at (1,1) -> attends (0,2)->idx 3 but NOT (0,3)->idx 4
    assert bias[1, 2] == 0 and bias[1, 3] == 0 and bias[1, 4] == -np.inf
    # every patch token attends exactly window^2 = 9 patch tokens
    patch = bias[1:, 1:]
    assert np.all((patch == 0).sum(axis=1) == 9)
    # (1,1) -> idx 1+5=6 sees all its 8 neighbours
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            j = 1 + (1 + dy) * 4 + (1 + dx)
            assert bias[6, j] == 0


def test_windowed_vit_runs_and_differs_from_global():
    from distill_any_depth_tpu.models.factory import create_model, init_params

    base = tiny_model_cfg("win")
    enc_win = dataclasses.replace(base.encoder, window_size=3)
    cfg_win = dataclasses.replace(base, encoder=enc_win)

    m_glob = create_model(base)
    m_win = create_model(cfg_win)
    params = init_params(m_glob, 0, image_size=112)  # 8x8 grid > window
    x = jnp.asarray(np.random.RandomState(0).rand(1, 112, 112, 3), jnp.float32)
    d_glob, _ = m_glob.apply({"params": params}, x)
    d_win, _ = m_win.apply({"params": params}, x)
    assert d_win.shape == d_glob.shape
    assert np.isfinite(np.asarray(d_win)).all()
    assert float(jnp.abs(d_win - d_glob).max()) > 1e-6  # masking has effect


def test_window_bias_matches_dense_masking():
    rng = np.random.RandomState(0)
    b, h, d, gh, gw = 1, 2, 16, 3, 3
    n = 1 + gh * gw
    q, k, v = (jnp.asarray(rng.randn(b, n, h, d).astype(np.float32)) for _ in range(3))
    bias = local_window_bias(gh, gw, window=5, n_prefix=1)
    out = mha_reference(q, k, v, bias=bias[None, None])
    # window 5 covers the whole 3x3 grid = global attention
    ref = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_step_timer():
    t = StepTimer()
    t.tick(4)
    t.tick(4)
    t.tick(4)
    assert t.steps_per_sec > 0
    assert t.images_per_sec > t.steps_per_sec


def test_visualize(tmp_path):
    rng = np.random.RandomState(0)
    path = visualize_depth_predictions(
        rng.rand(2, 16, 16), rng.rand(2, 16, 16), 7, str(tmp_path)
    )
    assert os.path.exists(path)
    plots = plot_history(
        {"train_loss": [3, 2, 1], "val_loss": [3.1, 2.2, 1.5], "lr": [0.1, 0.2]},
        str(tmp_path),
    )
    assert len(plots) == 2 and all(os.path.exists(p) for p in plots)


def test_tuner_ranks(tmp_path):
    from distill_any_depth_tpu.train.tuner import generate_experiment_configs, tune_loss_weights

    base = TrainConfig(
        student=tiny_model_cfg("tuner"), output_dir=str(tmp_path),
        optimizer=OptimizerConfig(total_steps=2),
    )
    grid = {"lambda_sc": (0.1, 0.9), "lambda_hdn": (0.5,)}
    cfgs = generate_experiment_configs(base, grid)
    assert len(cfgs) == 2
    assert {c.loss.lambda_sc for c in cfgs} == {0.1, 0.9}

    def fake_run(cfg):
        # score correlates with lambda_sc so ranking is deterministic
        return {"val_loss": [cfg.loss.lambda_sc]}

    results = tune_loss_weights(base, fake_run, grid=grid)
    assert results[0]["lambdas"]["lambda_sc"] == 0.1
    assert os.path.exists(os.path.join(str(tmp_path), "tuning_results.json"))


def test_hdn_demo_cli():
    from distill_any_depth_tpu.cli.hdn_demo import main

    out = main(size=64, batch=2, seed=0)
    assert set(out) == {"dr", "dp", "ds"}
    assert all(np.isfinite(v) for v in out.values())

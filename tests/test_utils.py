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


def test_tuner_traced_sweep_single_compile():
    """The traced-lambda sweep ranks combinations through ONE compiled step
    and matches the baked-constant loss for the same lambdas."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from distill_any_depth_tpu.configs import (
        LossConfig, OptimizerConfig, TrainConfig,
    )
    from distill_any_depth_tpu.models.factory import create_model, init_params
    from distill_any_depth_tpu.train.state import create_train_state
    from distill_any_depth_tpu.train.step import make_train_step
    from distill_any_depth_tpu.train.tuner import tune_loss_weights_traced
    from test_train import tiny_model_cfg

    tiny = tiny_model_cfg("tuner-s")
    base = TrainConfig(
        student=tiny, teachers=(),  # teachers built below via monkey config
        loss=LossConfig(use_hdn=True, hdn_variant="dr", hdn_level=2),
        optimizer=OptimizerConfig(lr=1e-3, warmup_steps=0, schedule="none",
                                  total_steps=50),
        batch_size=2, image_size=56, seed=0,
        student_compute_dtype="float32",
    )
    # teachers: TrainConfig.teachers are MODELS names; use the student arch
    # itself as a stand-in teacher by registering a temporary entry
    from distill_any_depth_tpu import configs as cfg_mod

    cfg_mod.MODELS["tiny-tuner-teacher"] = tiny
    try:
        base = dataclasses.replace(base, teachers=("tiny-tuner-teacher",))
        rng = np.random.RandomState(0)
        batches = [
            {"image": rng.rand(2, 56, 56, 3).astype(np.float32)}
            for _ in range(2)
        ]
        grid = {"lambda_sc": (0.25, 1.0), "lambda_hdn": (0.4,)}
        results = tune_loss_weights_traced(
            base, batches, batches[:1], grid=grid, steps_per_experiment=2,
            output_dir="/tmp/tuner_traced_test",
        )
        assert len(results) == 2
        assert results[0]["score"] <= results[1]["score"]
        assert all(np.isfinite(r["score"]) for r in results)

        # cross-check: traced weights == baked constants for one combo
        student = create_model(tiny)
        sp = init_params(student, 0, image_size=56)
        tp = init_params(create_model(tiny), 1, image_size=56)
        loss_cfg = dataclasses.replace(base.loss, lambda_sc=0.25, lambda_hdn=0.4)
        _, tx = create_train_state(sp, base.optimizer)
        apply = lambda p, x: student.apply({"params": p}, x)  # noqa: E731
        baked = make_train_step(apply, [apply], tx, loss_cfg, seed=0)
        traced = make_train_step(apply, [apply], tx, base.loss, seed=0)
        x = jnp.asarray(batches[0]["image"])
        st1, _ = create_train_state(jax.tree_util.tree_map(jnp.array, sp),
                                    base.optimizer)
        st1, m1 = baked(st1, (tp,), x, x)
        st2, _ = create_train_state(jax.tree_util.tree_map(jnp.array, sp),
                                    base.optimizer)
        st2, m2 = traced(st2, (tp,), x, x,
                         loss_weights={"sc": jnp.float32(0.25),
                                       "hdn": jnp.float32(0.4)})
        np.testing.assert_allclose(float(m1["total"]), float(m2["total"]),
                                   rtol=1e-6)
    finally:
        del cfg_mod.MODELS["tiny-tuner-teacher"]

"""Training subsystem tests: optimizer parity vs torch Adam, schedules,
smoke distillation steps on tiny models, checkpoint resume."""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distill_any_depth_tpu.configs import (
    EncoderConfig,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TrainConfig,
)
from distill_any_depth_tpu.models.factory import create_model, init_params
from distill_any_depth_tpu.train.state import (
    create_train_state,
    make_lr_schedule,
    make_optimizer,
)
from distill_any_depth_tpu.train.step import make_eval_loss_fn, make_train_step
from distill_any_depth_tpu.utils import checkpoint as ckpt_io


import contextlib


@contextlib.contextmanager
def _caplog_at(level, logger_name):
    """Collect log messages from one logger (message strings)."""
    import logging

    records = []

    class _H(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = _H(level=level)
    lg = logging.getLogger(logger_name)
    lg.addHandler(h)
    try:
        yield records
    finally:
        lg.removeHandler(h)

pytestmark = pytest.mark.slow


def tiny_model_cfg(name="tiny", **kw) -> ModelConfig:
    enc = EncoderConfig(
        name="tiny-enc", embed_dim=32, depth=3, num_heads=2,
        patch_size=14, base_img_size=56, out_indices=(0, 1, 2, 2),
    )
    return ModelConfig(name, enc, features=8, out_channels=(4, 8, 16, 32), **kw)


def _batch(bs=2, size=56, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.rand(bs, size, size, 3), jnp.float32)


# ----------------------------------------------------------------- optimizer

def test_adam_l2_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    w0 = rng.randn(5, 4).astype(np.float32)
    grads = [rng.randn(5, 4).astype(np.float32) for _ in range(4)]

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([wt], lr=1e-2, weight_decay=1e-2)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    cfg = OptimizerConfig(lr=1e-2, weight_decay=1e-2, warmup_steps=0,
                          schedule="none", max_grad_norm=0.0)
    tx = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_lr_schedule_warmup_cosine():
    cfg = OptimizerConfig(lr=1e-3, warmup_steps=10, schedule="cosine",
                          total_steps=110, eta_min_ratio=0.01)
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-6)
    assert float(sched(110)) == pytest.approx(1e-5, rel=1e-3)


# ------------------------------------------------------------------ training

@pytest.fixture(scope="module")
def tiny_setup():
    scfg = tiny_model_cfg("tiny-student")
    tcfg = tiny_model_cfg("tiny-teacher")
    student = create_model(scfg)
    teacher = create_model(tcfg)
    sp = init_params(student, 0, image_size=56)
    tp = init_params(teacher, 1, image_size=56)
    return scfg, student, sp, teacher, tp


def test_train_step_decreases_loss(tiny_setup):
    scfg, student, sp, teacher, tp = tiny_setup
    opt = OptimizerConfig(lr=1e-3, warmup_steps=0, schedule="none", total_steps=100)
    # copy: the train step donates the state, which would delete the
    # module-scoped fixture params
    state, tx = create_train_state(jax.tree_util.tree_map(jnp.array, sp), opt)
    loss_cfg = LossConfig(normalization="hybrid", use_hdn=True, hdn_variant="dr")

    step = make_train_step(
        lambda p, x: student.apply({"params": p}, x),
        [lambda p, x: teacher.apply({"params": p}, x)],
        tx, loss_cfg, seed=0,
    )
    x = _batch()
    losses = []
    for _ in range(6):
        state, metrics = step(state, (tp,), x, x)
        assert np.isfinite(float(metrics["total"]))
        losses.append(float(metrics["total"]))
    assert int(state.step) == 6
    assert losses[-1] < losses[0], losses
    assert float(metrics["grad_norm"]) > 0


def test_teacher_chunking_matches_plain_step(tiny_setup):
    """lax.map teacher chunking (TrainConfig.teacher_chunk) is a scheduling
    change: per-sample outputs match the plain forward up to XLA refusion
    rounding, and the training step tracks the plain step closely. (Bitwise
    param equality is NOT the contract — fusion boundaries differ, and Adam
    amplifies last-ulp teacher differences.)"""
    from distill_any_depth_tpu.train.step import chunked_apply

    scfg, student, sp, teacher, tp = tiny_setup
    x = _batch(bs=4)

    apply_fn = lambda p, xx: teacher.apply({"params": p}, xx)  # noqa: E731
    d_plain, f_plain = jax.jit(apply_fn)(tp, x)
    d_chunk, f_chunk = jax.jit(chunked_apply(apply_fn, 2))(tp, x)
    np.testing.assert_allclose(np.asarray(d_chunk), np.asarray(d_plain),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_chunk), np.asarray(f_plain),
                               rtol=1e-5, atol=1e-5)
    # non-divisible batch: silently the plain path (same function object)
    assert chunked_apply(apply_fn, 3)(tp, x)[0].shape == d_plain.shape
    assert chunked_apply(apply_fn, 0) is apply_fn

    opt = OptimizerConfig(lr=1e-3, warmup_steps=0, schedule="none",
                          total_steps=100)
    loss_cfg = LossConfig(normalization="hybrid", use_hdn=True,
                          hdn_variant="dr")

    def run(teacher_chunk):
        state, tx = create_train_state(
            jax.tree_util.tree_map(jnp.array, sp), opt
        )
        step = make_train_step(
            lambda p, xx: student.apply({"params": p}, xx),
            [apply_fn], tx, loss_cfg, seed=0, views_shared=True,
            teacher_chunk=teacher_chunk,
        )
        out = []
        for _ in range(2):
            state, metrics = step(state, (tp,), x, x)
            out.append(float(metrics["total"]))
        return out

    np.testing.assert_allclose(run(2), run(0), rtol=1e-4)


def test_trainer_with_real_windowed_teacher(tmp_path):
    """Drive the REAL windowed ViT-B config (MODELS['depthanything-base-
    window']: PosConv PEG, window bias, final_taps, interp_to_input) as a
    teacher through the actual Trainer step — the composition the reference
    runs when dam.py:361-362 instantiates the DinoWindow vitb teacher.
    126px -> 9x9 patch grid > window 7, so the window mask really masks."""
    from distill_any_depth_tpu.train.loop import Trainer

    cfg = TrainConfig(
        student=tiny_model_cfg("tiny-win-student"),
        teachers=("depthanything-base-window",),
        loss=LossConfig(use_hdn=False),
        optimizer=OptimizerConfig(lr=1e-4, warmup_steps=0, schedule="none",
                                  total_steps=4),
        batch_size=2, image_size=126, num_epochs=1, val_split=0.0,
        checkpoint_interval=0, log_interval=1, visualize_interval=0,
        output_dir=str(tmp_path), teacher_chunk=0,
    )
    import logging

    with _caplog_at(logging.WARNING, "distill_any_depth_tpu.train") as rec:
        trainer = Trainer(cfg)
    # crossover policy (VERDICT r4 #6): a windowed teacher below the
    # measured 518px crossover must warn, not be silently slower
    assert any("windowed attention LOSES" in m for m in rec), rec
    p0 = jax.tree_util.tree_map(np.array, trainer.state.params)

    def batches(epoch):
        rng = np.random.RandomState(0)
        for _ in range(2):
            yield {"image": rng.rand(2, 126, 126, 3).astype(np.float32)}

    history = trainer.run(batches, max_steps=2)
    assert np.all(np.isfinite(history["train_loss"])), history
    # gradients flowed: student params moved
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        trainer.state.params, p0,
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_multi_teacher_switch(tiny_setup):
    scfg, student, sp, teacher, tp = tiny_setup
    teacher2 = create_model(tiny_model_cfg("tiny-teacher2"))
    tp2 = init_params(teacher2, 2, image_size=56)
    opt = OptimizerConfig(lr=1e-4, warmup_steps=0, schedule="none", total_steps=100)
    state, tx = create_train_state(jax.tree_util.tree_map(jnp.array, sp), opt)
    loss_cfg = LossConfig(use_hdn=False)

    step = make_train_step(
        lambda p, x: student.apply({"params": p}, x),
        [
            lambda p, x: teacher.apply({"params": p}, x),
            lambda p, x: teacher2.apply({"params": p}, x),
        ],
        tx, loss_cfg, seed=0,
    )
    x = _batch()
    seen = set()
    for _ in range(8):
        state, metrics = step(state, (tp, tp2), x, x)
        seen.add(int(metrics["teacher_idx"]))
    assert seen == {0, 1}, seen  # both teachers get selected


def test_eval_loss_fn(tiny_setup):
    scfg, student, sp, teacher, tp = tiny_setup
    loss_cfg = LossConfig(use_hdn=True)
    eval_fn = make_eval_loss_fn(
        lambda p, x: student.apply({"params": p}, x),
        [lambda p, x: teacher.apply({"params": p}, x)],
        loss_cfg,
    )
    comps = eval_fn(sp, (tp,), jnp.int32(0), _batch(), _batch())
    assert {"sc", "lg", "feat", "grad", "hdn", "total"} <= set(comps)
    assert np.isfinite(float(comps["total"]))


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    scfg, student, sp, teacher, tp = tiny_setup
    opt = OptimizerConfig(lr=1e-3, warmup_steps=0, schedule="none", total_steps=10)
    state, tx = create_train_state(sp, opt)

    # orbax full-state roundtrip
    path = str(tmp_path / "state")
    ckpt_io.save_train_state(path, state)
    restored = ckpt_io.restore_train_state(path, template=state)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the Trainer layout: --resume may point at the run's output dir, which
    # holds the orbax state under train_state/
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    ckpt_io.save_train_state(str(run_dir / "train_state"), state)
    restored2 = ckpt_io.restore_train_state(str(run_dir), template=state)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # safetensors roundtrip through the reference layout
    st_path = str(tmp_path / "w.safetensors")
    ckpt_io.save_safetensors(st_path, sp, scfg)
    loaded = ckpt_io.load_safetensors(st_path, scfg)
    flat = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(loaded)}
    for p, v in jax.tree_util.tree_leaves_with_path(sp):
        np.testing.assert_allclose(
            np.asarray(v), flat[jax.tree_util.keystr(p)], rtol=1e-6
        )


def test_convert_checkpoint(tmp_path, tiny_setup):
    scfg, student, sp, *_ = tiny_setup
    src = str(tmp_path / "in.safetensors")
    dst = str(tmp_path / "out.safetensors")
    ckpt_io.save_safetensors(src, sp, scfg)
    n = ckpt_io.convert_checkpoint(src, dst)
    assert n > 0
    from safetensors import numpy as st_numpy

    keys = st_numpy.load_file(dst).keys()
    assert any(k.startswith("backbone.") for k in keys)
    assert not any(k.startswith("pretrained.") for k in keys)


def test_nonfinite_gradients_skip_update():
    """apply_if_finite: a NaN gradient must not change params or poison
    Adam moments."""
    cfg = OptimizerConfig(lr=1e-2, warmup_steps=0, schedule="none",
                          total_steps=10, skip_nonfinite_updates=True)
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)

    bad = {"w": jnp.asarray([1.0, jnp.nan, 2.0])}
    updates, state = tx.update(bad, state, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    np.testing.assert_array_equal(np.asarray(new["w"]), np.asarray(params["w"]))

    good = {"w": jnp.ones((3,))}
    updates, state = tx.update(good, state, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert float(jnp.abs(new["w"] - params["w"]).max()) > 0


def test_converted_params_own_their_memory():
    """torch tensor.numpy() is a view; conversion must copy so later
    in-place updates on the source don't mutate the tree (and vice versa
    for export)."""
    torch = pytest.importorskip("torch")
    from distill_any_depth_tpu.utils.torch_interop import (
        params_to_torch,
        torch_to_params,
    )
    from test_train import tiny_model_cfg

    cfg = tiny_model_cfg("own")
    from distill_any_depth_tpu.models.factory import create_model, init_params

    model = create_model(cfg)
    params = init_params(model, 0, image_size=56)
    state = params_to_torch(params, cfg)
    # export leaves own their memory
    assert all(a.flags["OWNDATA"] for a in state.values())

    tensors = {k: torch.from_numpy(v) for k, v in state.items()}
    tree = torch_to_params({k: t.numpy() for k, t in tensors.items()}, cfg)
    before = np.asarray(tree["pretrained"]["cls_token"]).copy()
    tensors["pretrained.cls_token"].add_(123.0)  # in-place source mutation
    np.testing.assert_array_equal(
        np.asarray(tree["pretrained"]["cls_token"]), before
    )


def test_heterogeneous_teachers_switch(tiny_setup):
    """Teachers with different embed dims share one compiled step: the
    feature loss is computed inside the lax.switch branch (branch outputs
    must be type-equal, so raw features cannot cross the switch)."""
    import dataclasses

    scfg, student, sp, teacher, tp = tiny_setup
    big_enc = dataclasses.replace(
        tiny_model_cfg("tiny-big").encoder, embed_dim=64, num_heads=4
    )
    big_cfg = dataclasses.replace(tiny_model_cfg("tiny-big"), encoder=big_enc)
    teacher2 = create_model(big_cfg)
    tp2 = init_params(teacher2, 3, image_size=56)

    opt = OptimizerConfig(lr=1e-4, warmup_steps=0, schedule="none", total_steps=100)
    state, tx = create_train_state(jax.tree_util.tree_map(jnp.array, sp), opt)
    step = make_train_step(
        lambda p, x: student.apply({"params": p}, x),
        [
            lambda p, x: teacher.apply({"params": p}, x),
            lambda p, x: teacher2.apply({"params": p}, x),
        ],
        tx, LossConfig(use_hdn=False), seed=0,
    )
    x = _batch()
    seen = set()
    for _ in range(6):
        state, metrics = step(state, (tp, tp2), x, x)
        assert np.isfinite(float(metrics["total"]))
        seen.add(int(metrics["teacher_idx"]))
    assert seen == {0, 1}


def test_reg_and_window_teachers_train_step(tiny_setup):
    """End-to-end training dryrun with a registers teacher and a windowed
    teacher (the reference's use_registers / DinoWindow teacher families,
    dam.py:344-365, ViT_DINO.py:875-1264): both wire through the standard
    multi-teacher step."""
    scfg, student, sp, _teacher, _tp = tiny_setup

    reg_enc = dataclasses.replace(
        tiny_model_cfg("tiny-reg").encoder,
        num_register_tokens=4, init_values=1e-5,
    )
    reg_cfg = dataclasses.replace(
        tiny_model_cfg("tiny-reg", trailing_head_relu=False, interp_to_input=True),
        encoder=reg_enc,
    )
    win_enc = dataclasses.replace(
        tiny_model_cfg("tiny-win").encoder,
        window_size=3, use_pos_conv=True, use_cls_token=False, final_taps=True,
    )
    win_cfg = dataclasses.replace(
        tiny_model_cfg("tiny-win", trailing_head_relu=False, interp_to_input=True),
        encoder=win_enc,
    )
    t_reg = create_model(reg_cfg)
    t_win = create_model(win_cfg)
    tp_reg = init_params(t_reg, 4, image_size=56)
    tp_win = init_params(t_win, 5, image_size=56)

    opt = OptimizerConfig(lr=1e-4, warmup_steps=0, schedule="none", total_steps=100)
    state, tx = create_train_state(jax.tree_util.tree_map(jnp.array, sp), opt)
    step = make_train_step(
        lambda p, x: student.apply({"params": p}, x),
        [
            lambda p, x: t_reg.apply({"params": p}, x),
            lambda p, x: t_win.apply({"params": p}, x),
        ],
        tx, LossConfig(use_hdn=False), seed=0,
    )
    x = _batch()
    seen = set()
    for _ in range(4):
        state, metrics = step(state, (tp_reg, tp_win), x, x)
        assert np.isfinite(float(metrics["total"]))
        seen.add(int(metrics["teacher_idx"]))
    assert seen == {0, 1}


def test_wo_relu_1_2_channel_head():
    """dam.py:414-417: channels 0-1 signed, channels 2+ ReLU'd."""
    cfg = tiny_model_cfg(
        "tiny-multichan", head_out_channels=4, trailing_head_relu=False,
        wo_relu_1_2_channel=True,
    )
    model = create_model(cfg)
    params = init_params(model, 0, image_size=56)
    depth, _ = model.apply({"params": params}, _batch(bs=1))
    depth = np.asarray(depth)
    assert depth.shape == (1, 56, 56, 4)
    assert np.all(depth[..., 2:] >= 0)
    assert np.any(depth[..., :2] < 0)  # signed channels pass through

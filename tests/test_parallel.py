"""Multi-device data-parallel tests on the 8-device virtual CPU mesh.

The detectron2-style contract (SURVEY.md §4): real tiny multi-device runs,
no mocked communication. DP-sharded training must match single-device
training bit-for-bit-ish (same global batch, same update).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distill_any_depth_tpu.configs import LossConfig, OptimizerConfig
from distill_any_depth_tpu.models.factory import create_model, init_params
from distill_any_depth_tpu.parallel.mesh import (
    batch_sharding,
    host_local_batch_size,
    make_mesh,
    shard_batch,
)
from distill_any_depth_tpu.train.state import create_train_state
from distill_any_depth_tpu.train.step import make_train_step
from test_train import tiny_model_cfg, _batch

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest XLA_FLAGS)")
    return make_mesh(dp=8)


def _assert_grads_close(got, want, leaf_l2_rtol=5e-3):
    """Gradient equality up to fp reduction-order noise AND subgradient
    tie-routing. Random-init depth maps are mostly ReLU zeros, so the
    normalization/HDN medians see many exactly-tied elements; a different
    reduction order (sharded vs single-device compile) can route the
    mathematically ambiguous median subgradient to a *different tied
    element*. Elementwise equality there is therefore not an invariant —
    bound the global gradient norm and each leaf's L2 difference instead
    (a missing psum / duplicated shard shifts leaf L2 by O(1), far above
    these tolerances)."""
    import optax

    np.testing.assert_allclose(
        float(optax.global_norm(got)), float(optax.global_norm(want)), rtol=1e-3
    )
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(got), jax.tree_util.tree_leaves(want)
    ):
        a, b = np.asarray(a), np.asarray(b)
        l2 = float(np.linalg.norm(a - b))
        ref = float(np.linalg.norm(b))
        assert l2 <= leaf_l2_rtol * ref + 1e-6, (
            jax.tree_util.keystr(path), l2, ref
        )


def _setup():
    student = create_model(tiny_model_cfg("s"))
    teacher = create_model(tiny_model_cfg("t"))
    sp = init_params(student, 0, image_size=56)
    tp = init_params(teacher, 1, image_size=56)
    opt = OptimizerConfig(lr=1e-3, warmup_steps=0, schedule="none", total_steps=10)
    return student, teacher, sp, tp, opt


def test_mesh_shapes(mesh):
    assert mesh.shape == {"data": 8, "model": 1}
    assert host_local_batch_size(mesh, 16) == 2
    with pytest.raises(ValueError):
        host_local_batch_size(mesh, 9)


def test_dp_gradients_match_single_device(mesh):
    """The invariant of data parallelism: global loss and gradients computed
    on the sharded batch equal the single-device values (up to psum
    reduction-order noise). Comparing post-Adam params instead would be
    ill-conditioned: for near-zero gradient elements Adam's g/sqrt(v) is
    +-1 regardless of |g|, so fp noise flips full-size updates."""
    student, teacher, sp, tp, opt = _setup()
    loss_cfg = LossConfig(use_hdn=True, hdn_variant="dr")

    from distill_any_depth_tpu.losses.distill import combined_distillation_loss
    from distill_any_depth_tpu.parallel.mesh import replicated

    def loss_fn(p, tparams, x):
        sg, _ = student.apply({"params": p}, x)
        sl, sf = student.apply({"params": p}, x)
        td, tf = teacher.apply({"params": tparams}, x)
        td, tf = jax.lax.stop_gradient(td), jax.lax.stop_gradient(tf)
        total, _ = combined_distillation_loss(loss_cfg, sg, sl, sf, td, tf)
        return total

    x = _batch(bs=8, size=56, seed=3)

    g_single = jax.jit(jax.value_and_grad(loss_fn))(sp, tp, x)
    rep, data = replicated(mesh), batch_sharding(mesh)
    g_dp = jax.jit(
        jax.value_and_grad(loss_fn), in_shardings=(rep, rep, data),
        out_shardings=(rep, rep),
    )(sp, tp, shard_batch(mesh, x))

    np.testing.assert_allclose(float(g_dp[0]), float(g_single[0]), rtol=1e-4)
    _assert_grads_close(g_dp[1], g_single[1])


def test_dp_train_step_runs(mesh):
    from distill_any_depth_tpu.parallel.mesh import replicate

    student, teacher, sp, tp, opt = _setup()
    loss_cfg = LossConfig(use_hdn=False)
    s_apply = lambda p, x: student.apply({"params": p}, x)  # noqa: E731
    t_apply = lambda p, x: teacher.apply({"params": p}, x)  # noqa: E731
    state, tx = create_train_state(replicate(mesh, sp), opt)
    step = make_train_step(s_apply, [t_apply], tx, loss_cfg, seed=0, mesh=mesh)
    x = shard_batch(mesh, _batch(bs=8, size=56, seed=3))
    tp_rep = replicate(mesh, tp)
    state, m1 = step(state, (tp_rep,), x, x)
    state, m2 = step(state, (tp_rep,), x, x)
    assert int(state.step) == 2
    assert float(m2["total"]) < float(m1["total"])


def test_tp_dp_gradients_match_single_device(mesh):
    """Tensor parallelism (model axis) composed with DP reproduces
    single-device loss/gradients."""
    from distill_any_depth_tpu.parallel.mesh import make_mesh, replicate
    from distill_any_depth_tpu.parallel.tp import shard_params, tp_param_specs
    from distill_any_depth_tpu.losses.distill import combined_distillation_loss
    from jax.sharding import PartitionSpec as P

    mesh2 = make_mesh(dp=4, model=2)
    student, teacher, sp, tp, opt = _setup()
    loss_cfg = LossConfig(use_hdn=False)

    # sanity: the spec tree actually shards attention/mlp kernels
    specs = tp_param_specs(sp)
    flat = {
        jax.tree_util.keystr(p): s
        for p, s in jax.tree_util.tree_leaves_with_path(
            specs, is_leaf=lambda x: isinstance(x, P)
        )
    }
    assert any(s == P(None, "model") for s in flat.values())
    assert any(s == P("model", None) for s in flat.values())

    def loss_fn(p, tparams, x):
        sg, _ = student.apply({"params": p}, x)
        sl, sf = student.apply({"params": p}, x)
        td, tf = teacher.apply({"params": tparams}, x)
        td, tf = jax.lax.stop_gradient(td), jax.lax.stop_gradient(tf)
        total, _ = combined_distillation_loss(loss_cfg, sg, sl, sf, td, tf)
        return total

    x = _batch(bs=8, size=56, seed=3)
    g_single = jax.jit(jax.value_and_grad(loss_fn))(sp, tp, x)

    sp_tp = shard_params(mesh2, sp)
    tp_rep = replicate(mesh2, tp)
    xb = shard_batch(mesh2, x)
    g_tp = jax.jit(jax.value_and_grad(loss_fn))(sp_tp, tp_rep, xb)

    np.testing.assert_allclose(float(g_tp[0]), float(g_single[0]), rtol=1e-4)
    _assert_grads_close(g_tp[1], g_single[1])


def test_batch_is_actually_sharded(mesh):
    x = _batch(bs=8)
    xs = shard_batch(mesh, x)
    assert xs.sharding == batch_sharding(mesh)
    # each device holds 1/8 of the batch
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(1, 56, 56, 3)}


def test_trainer_with_dp_mesh(mesh, tmp_path):
    """Trainer end-to-end on the virtual mesh via cfg.dp."""
    import dataclasses
    from distill_any_depth_tpu import configs
    from distill_any_depth_tpu.configs import LossConfig, OptimizerConfig, TrainConfig
    from distill_any_depth_tpu.train.loop import Trainer

    configs.MODELS.setdefault("tiny-dp-s", tiny_model_cfg("tiny-dp-s"))
    configs.MODELS.setdefault("tiny-dp-t", tiny_model_cfg("tiny-dp-t"))
    cfg = TrainConfig(
        student=configs.MODELS["tiny-dp-s"], teachers=("tiny-dp-t",),
        loss=LossConfig(use_hdn=False),
        optimizer=OptimizerConfig(total_steps=4),
        batch_size=8, image_size=56, num_epochs=1, val_split=0.0,
        checkpoint_interval=0, log_interval=10, visualize_interval=0,
        output_dir=str(tmp_path), dp=8,
    )
    trainer = Trainer(cfg)
    assert trainer.mesh is not None and trainer.mesh.shape["data"] == 8

    def batches(epoch):
        for seed in range(2):
            yield {"image": np.asarray(_batch(bs=8, size=56, seed=seed))}

    hist = trainer.run(batches, max_steps=2)
    assert np.isfinite(hist["train_loss"][0])


def test_trainer_with_tp_dp_mesh(mesh, tmp_path):
    """Trainer end-to-end on a 4x2 TPxDP mesh via cfg.dp/cfg.tp — the
    one-flag multi-chip UX (dad-train --dp 4 --tp 2). Student AND teacher
    kernels must actually be model-sharded."""
    from jax.sharding import PartitionSpec as P

    from distill_any_depth_tpu import configs
    from distill_any_depth_tpu.configs import LossConfig, OptimizerConfig, TrainConfig
    from distill_any_depth_tpu.train.loop import Trainer

    configs.MODELS.setdefault("tiny-tpdp-s", tiny_model_cfg("tiny-tpdp-s"))
    configs.MODELS.setdefault("tiny-tpdp-t", tiny_model_cfg("tiny-tpdp-t"))
    cfg = TrainConfig(
        student=configs.MODELS["tiny-tpdp-s"], teachers=("tiny-tpdp-t",),
        loss=LossConfig(use_hdn=False),
        optimizer=OptimizerConfig(total_steps=4),
        batch_size=8, image_size=56, num_epochs=1, val_split=0.0,
        checkpoint_interval=0, log_interval=10, visualize_interval=0,
        output_dir=str(tmp_path), dp=4, tp=2,
    )
    trainer = Trainer(cfg)
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}

    def spec_of(tree, *path):
        node = tree
        for p in path:
            node = node[p]
        return node.sharding.spec

    # student qkv kernel sharded over the model axis; teacher too
    blk = next(k for k in trainer.student_params["pretrained"] if k.startswith("blocks_"))
    assert spec_of(trainer.student_params, "pretrained", blk, "attn", "qkv",
                   "kernel") == P(None, "model")
    tblk = next(
        k for k in trainer.teacher_params[0]["pretrained"] if k.startswith("blocks_")
    )
    assert spec_of(trainer.teacher_params[0], "pretrained", tblk, "attn",
                   "proj", "kernel") == P("model", None)

    def batches(epoch):
        for seed in range(2):
            yield {"image": np.asarray(_batch(bs=8, size=56, seed=seed))}

    hist = trainer.run(batches, max_steps=2)
    assert np.isfinite(hist["train_loss"][0])
    assert int(trainer.state.step) == 2

"""LoRA/SSF adapter and register-token variant tests."""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from distill_any_depth_tpu.configs import ENCODERS, MODELS, ModelConfig
from distill_any_depth_tpu.models.adapters import adapter_label_tree
from distill_any_depth_tpu.models.factory import create_model, init_params
from distill_any_depth_tpu.utils import checkpoint as ckpt_io
from test_train import tiny_model_cfg


def _adapter_cfg(**enc_kw) -> ModelConfig:
    base = tiny_model_cfg("adapt")
    enc = dataclasses.replace(base.encoder, **enc_kw)
    return dataclasses.replace(base, encoder=enc)


def test_lora_identity_at_init():
    """LoRA B=0 init: outputs equal the base model given the same base
    weights."""
    cfg_plain = tiny_model_cfg("plain")
    cfg_lora = _adapter_cfg(lora_rank=4)
    m_plain = create_model(cfg_plain)
    m_lora = create_model(cfg_lora)

    p_lora = init_params(m_lora, 0, image_size=56)
    # strip adapters -> plain param tree
    def strip(t):
        if isinstance(t, dict):
            return {k: strip(v) for k, v in t.items() if k not in ("lora_a", "lora_b")}
        return t

    p_plain = strip(p_lora)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 56, 56, 3), jnp.float32)
    d1, _ = m_plain.apply({"params": p_plain}, x)
    d2, _ = m_lora.apply({"params": p_lora}, x)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)


def test_ssf_identity_at_init():
    cfg_plain = tiny_model_cfg("plain2")
    cfg_ssf = _adapter_cfg(use_ssf=True)
    m_plain = create_model(cfg_plain)
    m_ssf = create_model(cfg_ssf)
    p_ssf = init_params(m_ssf, 0, image_size=56)

    def strip(t):
        if isinstance(t, dict):
            return {k: strip(v) for k, v in t.items() if not k.startswith("ssf_")}
        return t

    x = jnp.asarray(np.random.RandomState(0).rand(1, 56, 56, 3), jnp.float32)
    d1, _ = m_plain.apply({"params": strip(p_ssf)}, x)
    d2, _ = m_ssf.apply({"params": p_ssf}, x)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)


def test_adapter_only_training_mask():
    cfg = _adapter_cfg(lora_rank=4, use_ssf=True)
    model = create_model(cfg)
    params = init_params(model, 0, image_size=56)
    labels = adapter_label_tree(params)
    flat = jax.tree_util.tree_leaves(labels)
    assert "adapter" in flat and "frozen" in flat

    tx = optax.multi_transform(
        {"adapter": optax.sgd(1e-2), "frozen": optax.set_to_zero()}, labels
    )
    opt_state = tx.init(params)

    def loss(p, x):
        d, _ = model.apply({"params": p}, x)
        return jnp.mean(d**2) + jnp.mean(d)

    x = jnp.asarray(np.random.RandomState(0).rand(1, 56, 56, 3), jnp.float32)
    grads = jax.grad(loss)(params, x)
    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)

    changed = frozen_changed = 0
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(new),
    ):
        keys = [str(getattr(p, "key", "")) for p in path]
        is_adapter = any(k in ("lora_a", "lora_b") or k.startswith("ssf_") for k in keys)
        diff = float(jnp.abs(a - b).max())
        if is_adapter and diff > 0:
            changed += 1
        if not is_adapter and diff > 0:
            frozen_changed += 1
    assert changed > 0
    assert frozen_changed == 0


def test_register_tokens_variant():
    """DINOv2-with-registers: 4 register tokens inserted after cls, stripped
    from taps (ViT_DINO_reg.py:935-955)."""
    base = tiny_model_cfg("reg")
    enc = dataclasses.replace(base.encoder, num_register_tokens=4,
                              interpolate_offset=0.0)
    cfg = dataclasses.replace(base, encoder=enc)
    model = create_model(cfg)
    params = init_params(model, 0, image_size=56)
    assert "register_tokens" in params["pretrained"]
    x = jnp.asarray(np.random.RandomState(0).rand(2, 56, 56, 3), jnp.float32)
    depth, feat = model.apply({"params": params}, x)
    assert depth.shape == (2, 56, 56)
    assert feat.shape == (2, 16, enc.embed_dim)  # registers stripped


def test_torch_export_carries_adapters(tmp_path):
    """Adapter leaves export under the 'adapters.' framework namespace
    (torch loaders ignore them; ours restores them exactly) — adapter-only
    checkpoints are complete, not frozen-base-only."""
    cfg = _adapter_cfg(lora_rank=4, use_ssf=True)
    model = create_model(cfg)
    params = init_params(model, 0, image_size=56)
    path = str(tmp_path / "w.safetensors")
    ckpt_io.save_safetensors(path, params, cfg)
    from safetensors import numpy as st_numpy

    keys = st_numpy.load_file(path).keys()
    adapter_keys = [k for k in keys if k.startswith("adapters.")]
    assert adapter_keys and all(
        "lora_" in k or ".ssf_" in k for k in adapter_keys
    )
    # torch-namespace keys stay clean of adapters (reference interop intact)
    assert not any(
        ("lora" in k or "ssf" in k) for k in keys if not k.startswith("adapters.")
    )

    # loading back (no template needed) restores the exact tree
    loaded = ckpt_io.load_safetensors(path, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(loaded)
    }
    assert len(flat_a) == len(flat_b)
    for p, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v), flat_b[jax.tree_util.keystr(p)])


def test_trainer_adapter_only_finetuning(tmp_path):
    """Trainer with adapter_only: base params frozen, adapters move."""
    import dataclasses
    from distill_any_depth_tpu import configs
    from distill_any_depth_tpu.configs import (
        LossConfig, OptimizerConfig, TrainConfig,
    )
    from distill_any_depth_tpu.train.loop import Trainer

    base = tiny_model_cfg("ft-student")
    enc = dataclasses.replace(base.encoder, lora_rank=4, use_ssf=True)
    configs.MODELS["ft-student"] = dataclasses.replace(base, encoder=enc)
    configs.MODELS["ft-teacher"] = tiny_model_cfg("ft-teacher")

    cfg = TrainConfig(
        student=configs.MODELS["ft-student"], teachers=("ft-teacher",),
        loss=LossConfig(use_hdn=False),
        optimizer=OptimizerConfig(lr=1e-2, total_steps=4, warmup_steps=0,
                                  schedule="none"),
        batch_size=2, image_size=56, num_epochs=1, val_split=0.0,
        checkpoint_interval=0, log_interval=10, visualize_interval=0,
        output_dir=str(tmp_path), adapter_only=True,
    )
    trainer = Trainer(cfg)
    before = jax.tree_util.tree_map(np.asarray, trainer.state.params)

    def batches(epoch):
        rng = np.random.RandomState(0)
        for _ in range(2):
            yield {"image": rng.rand(2, 56, 56, 3).astype(np.float32)}

    trainer.run(batches, max_steps=2)
    after = trainer.state.params

    frozen_moved = adapter_moved = 0
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(before),
        jax.tree_util.tree_leaves_with_path(after),
    ):
        keys = [str(getattr(p, "key", "")) for p in path]
        is_adapter = any(
            k in ("lora_a", "lora_b") or k.startswith("ssf_") for k in keys
        )
        moved = float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
        if is_adapter and moved:
            adapter_moved += 1
        if not is_adapter and moved:
            frozen_moved += 1
    assert adapter_moved > 0
    assert frozen_moved == 0

    # the artifact named "final" must carry the TRAINED adapters: save ->
    # load -> bitwise-identical forward (the whole point of adapter_only
    # checkpoints; previously they silently exported frozen base weights)
    final = str(tmp_path / "student_final.safetensors")
    assert os.path.exists(final)
    loaded = ckpt_io.load_safetensors(final, cfg.student)
    model = trainer.student
    x = jnp.asarray(np.random.RandomState(1).rand(2, 56, 56, 3), jnp.float32)
    d_trained, _ = model.apply({"params": trainer.state.params}, x)
    d_loaded, _ = model.apply({"params": loaded}, x)
    np.testing.assert_array_equal(np.asarray(d_trained), np.asarray(d_loaded))


def test_adapter_only_without_adapters_raises(tmp_path):
    from distill_any_depth_tpu import configs
    from distill_any_depth_tpu.configs import TrainConfig, OptimizerConfig
    from distill_any_depth_tpu.train.loop import Trainer

    configs.MODELS.setdefault("plain-ft", tiny_model_cfg("plain-ft"))
    cfg = TrainConfig(
        student=configs.MODELS["plain-ft"], teachers=("plain-ft",),
        optimizer=OptimizerConfig(total_steps=2),
        batch_size=2, image_size=56, output_dir=str(tmp_path),
        adapter_only=True,
    )
    with pytest.raises(ValueError, match="no LoRA/SSF"):
        Trainer(cfg)

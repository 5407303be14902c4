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
    """Adapter checkpoints are complete, not frozen-base-only: encoder-block
    LoRA exports in the REFERENCE's own key convention (lora_A [r,in] /
    lora_B [out,r], ViT_DINO_reg.py:87-88) so its loaders consume it; SSF
    (no 1:1 torch mapping — the reference taps inside its modules at other
    dims) stays under the 'adapters.' framework namespace."""
    cfg = _adapter_cfg(lora_rank=4, use_ssf=True)
    model = create_model(cfg)
    params = init_params(model, 0, image_size=56)
    path = str(tmp_path / "w.safetensors")
    ckpt_io.save_safetensors(path, params, cfg)
    from safetensors import numpy as st_numpy

    tensors = st_numpy.load_file(path)
    keys = tensors.keys()
    adapter_keys = [k for k in keys if k.startswith("adapters.")]
    assert adapter_keys and all(".ssf_" in k for k in adapter_keys)
    lora_keys = [k for k in keys if k.endswith((".lora_A", ".lora_B"))]
    assert lora_keys and all(k.startswith("pretrained.blocks.") for k in lora_keys)
    # reference convention: A [r, in], B [out, r]
    a = tensors["pretrained.blocks.0.attn.qkv.lora_A"]
    b = tensors["pretrained.blocks.0.attn.qkv.lora_B"]
    assert a.shape[0] == 4 and b.shape[1] == 4
    # no framework-layout lora leaks outside the reference keys
    assert not any(
        "lora" in k for k in keys if not k.endswith((".lora_A", ".lora_B"))
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


def test_lora_reference_interop_semantics():
    """Converted reference LoRA weights reproduce the reference LoRALinear
    math exactly (ViT_DINO_reg.py:126-131: y = xW^T + b + x A^T B^T * a/r),
    and the export path round-trips bit-exactly (the alpha-ratio fold is a
    power of two)."""
    import sys
    sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
    from reference_loader import reference_available, load_reference_vit_dino_reg

    if not reference_available():
        pytest.skip("reference tree not mounted")
    torch = pytest.importorskip("torch")
    mod = load_reference_vit_dino_reg()

    torch.manual_seed(0)
    lin = mod.LoRALinear(16, 48, r=4, bias=True)
    with torch.no_grad():  # B is zero-init; randomize for a non-trivial check
        lin.lora_B.copy_(torch.randn_like(lin.lora_B))
    x = torch.randn(2, 16)
    with torch.no_grad():
        y_ref = lin(x).numpy()

    from distill_any_depth_tpu.models.adapters import LoRADense
    from distill_any_depth_tpu.utils.torch_interop import (
        params_to_torch, torch_to_params,
    )

    state = {
        "pretrained.blocks.0.attn.qkv.weight": lin.weight.detach().numpy(),
        "pretrained.blocks.0.attn.qkv.bias": lin.bias.detach().numpy(),
        "pretrained.blocks.0.attn.qkv.lora_A": lin.lora_A.detach().numpy(),
        "pretrained.blocks.0.attn.qkv.lora_B": lin.lora_B.detach().numpy(),
    }
    cfg = _adapter_cfg(lora_rank=4)
    tree = torch_to_params(state, cfg, strict=False)
    qkv = tree["pretrained"]["blocks_0"]["attn"]["qkv"]

    dense = LoRADense(features=48, rank=4)  # alpha=8 default
    y = dense.apply({"params": qkv}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-6)

    # export round-trip: reference keys back out, bit-identical values
    out = params_to_torch(tree, cfg)
    for key in state:
        np.testing.assert_array_equal(out[key], state[key])

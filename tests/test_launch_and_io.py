"""Launch-helper degradation and PFM/PLY/point-cloud IO tests."""
import os

import numpy as np

from distill_any_depth_tpu.parallel import launch
from distill_any_depth_tpu.utils.image_util import (
    depth_to_point_cloud,
    read_pfm,
    write_pfm,
    write_ply,
)


def test_launch_single_process_degradation():
    assert launch.process_count() == 1
    assert launch.process_index() == 0
    assert launch.is_main_process()
    launch.synchronize()  # no-op
    g = launch.all_gather_array(np.arange(4))
    assert g.shape == (1, 4)
    s1 = launch.shared_random_seed(123)
    assert s1 == 123


def test_pfm_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    depth = rng.rand(12, 17).astype(np.float32) * 10
    path = str(tmp_path / "d.pfm")
    write_pfm(path, depth)
    back, scale = read_pfm(path)
    np.testing.assert_allclose(back, depth, rtol=1e-6)
    assert scale == 1.0

    color = rng.rand(8, 9, 3).astype(np.float32)
    write_pfm(str(tmp_path / "c.pfm"), color)
    back, _ = read_pfm(str(tmp_path / "c.pfm"))
    np.testing.assert_allclose(back, color, rtol=1e-6)


def test_point_cloud_and_ply(tmp_path):
    depth = np.ones((4, 6), np.float32) * 2.0
    rgb = np.zeros((4, 6, 3), np.uint8)
    rgb[..., 0] = 255
    mask = depth > 0
    pts, colors = depth_to_point_cloud(depth, fx=10, fy=10, rgb=rgb, mask=mask)
    assert pts.shape == (24, 3)
    np.testing.assert_allclose(pts[:, 2], 2.0)
    # center pixel projects to ~(0,0,z)
    center = pts[np.argmin(np.abs(pts[:, 0]) + np.abs(pts[:, 1]))]
    assert abs(center[0]) < 0.2 and abs(center[1]) < 0.2

    path = str(tmp_path / "cloud.ply")
    write_ply(path, pts, colors)
    text = open(path).read()
    assert text.startswith("ply")
    assert "element vertex 24" in text
    assert text.strip().endswith("255 0 0")


def test_aot_export_roundtrip(tmp_path):
    """Serialized StableHLO artifact reproduces the live model's output and
    is loadable without the model object."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.models.factory import create_model, init_params
    from distill_any_depth_tpu.utils.export import export_forward, load_exported
    from test_train import tiny_model_cfg

    cfg = tiny_model_cfg("export")
    model = create_model(cfg)
    params = init_params(model, 0, image_size=56)

    blob = export_forward(model, params, image_size=56, batch_size=1)
    assert isinstance(blob, bytes) and len(blob) > 1000
    path = tmp_path / "model.stablehlo"
    path.write_bytes(blob)

    fn = load_exported(path.read_bytes())
    x = jnp.asarray(np.random.RandomState(0).rand(1, 56, 56, 3), jnp.float32)
    want, _ = model.apply({"params": params}, x)
    got = fn(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_export_with_params_roundtrip(tmp_path):
    """Weights-as-arguments StableHLO export: same outputs as the live
    model, artifact much smaller than the weights it would otherwise embed
    (the serving path for ViT-L-sized models, utils/export.py)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.models.factory import create_model, init_params
    from distill_any_depth_tpu.utils.export import (
        export_forward_with_params,
        load_exported_with_params,
    )
    from test_train import tiny_model_cfg

    cfg = tiny_model_cfg("export-args")
    model = create_model(cfg)
    params = init_params(model, 0, image_size=56)
    n_weight_bytes = sum(
        np.asarray(v).nbytes for v in jax.tree_util.tree_leaves(params)
    )

    weights = tmp_path / "weights.safetensors"
    blob = export_forward_with_params(
        model, params, str(weights), image_size=56, batch_size=1
    )
    assert weights.exists() and weights.stat().st_size >= n_weight_bytes
    # the program must not embed the weights as constants
    assert len(blob) < n_weight_bytes / 2, (len(blob), n_weight_bytes)

    fn = load_exported_with_params(blob, str(weights))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 56, 56, 3), jnp.float32)
    want, _ = model.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(fn(x)), np.asarray(want), atol=1e-5)

"""FULL-PIPELINE cross-framework parity.

Module-level parity (models, losses, transforms, metrics) is proven
elsewhere; these tests prove the *composed* chains agree end-to-end with
shared weights:

1. Inference: the torch reference chain (tools/testers/infer.py:122-153 —
   cv2 read -> midas Resize lower_bound/14 -> ImageNet normalize -> forward
   -> min-max disparity) vs this framework's COMPLETE ``cli/infer.main`` on
   the reference's own bundled real images (/root/reference/data/input),
   per-pixel.

2. Evaluation: the torch reference eval loop (tools/evaluate.py:116-155,
   its actual ``evaluate_model``/``compute_depth_metrics`` functions) vs this
   framework's COMPLETE ``cli/evaluate.main`` on a file-backed synthetic NYU
   test set, metric-for-metric.

Both run the shipped CLIs, not test harness shortcuts — checkpoint
conversion, data loading, batching, padding, alignment, and reporting all in
the loop.
"""
import os
import sys
from glob import glob

import numpy as np
import pytest

import jax  # noqa: F401  (conftest pins the CPU platform first)

from reference_loader import (
    REFERENCE_ROOT,
    load_reference_eval_module,
    load_reference_student,
    reference_available,
)

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

pytestmark = [
    pytest.mark.parity,
    pytest.mark.skipif(not reference_available(), reason="reference tree not mounted"),
]

REF_INPUT_DIR = os.path.join(REFERENCE_ROOT, "data", "input")


def _make_vits_reference(positive_head_bias: float = 0.0):
    """Random-init reference ViT-S student + its state dict (numpy)."""
    torch.manual_seed(0)
    DepthAnythingV2 = load_reference_student()
    ref = DepthAnythingV2(
        encoder="vits", features=64, out_channels=[48, 96, 192, 384]
    )
    if positive_head_bias:
        # push depth outputs clear of the trailing ReLU's zero plateau so
        # log-metrics and mean-ratio alignment are well-conditioned on both
        # sides (random init would emit exact zeros)
        with torch.no_grad():
            ref.depth_head.scratch.output_conv2[2].bias.add_(positive_head_bias)
    ref.eval()
    state = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    return ref, state


def _save_reference_ckpt(state, path) -> str:
    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(v) for k, v in state.items()}, str(path))
    return str(path)


def test_infer_pipeline_parity_on_reference_images(tmp_path):
    """Same random-init weights through BOTH complete inference chains on the
    reference's 9 bundled real images -> per-pixel disparity agreement."""
    ref, state = _make_vits_reference()
    ckpt = _save_reference_ckpt(state, tmp_path / "vits.safetensors")

    # ---- this framework: the shipped CLI, end to end ------------------
    from distill_any_depth_tpu.cli import infer as infer_cli

    args = infer_cli.argument_parser().parse_args(
        [
            "--arch_name", "depthanything-small",
            "--checkpoint", ckpt,
            "--input", REF_INPUT_DIR,
            "--output_dir", str(tmp_path / "out"),
            "--processing_res", "196",
            "--dtype", "float32",
            "--batch_size", "4",
            "--save_npy",
        ]
    )
    written = infer_cli.main(args)
    image_paths = sorted(glob(os.path.join(REF_INPUT_DIR, "*")))
    assert len(written) == len(image_paths) == 9

    # ---- torch reference chain (tools/testers/infer.py:122-147) -------
    for p in (REFERENCE_ROOT,):
        if p not in sys.path:
            sys.path.insert(0, p)
    from distillanydepth.midas.transforms import (  # noqa: E402
        NormalizeImage,
        PrepareForNet,
        Resize,
    )

    transforms = [
        Resize(
            196, 196, resize_target=False, keep_aspect_ratio=False,
            ensure_multiple_of=14, resize_method="lower_bound",
            image_interpolation_method=cv2.INTER_CUBIC,
        ),
        NormalizeImage(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
        PrepareForNet(),
    ]

    checked = 0
    for path in image_paths:
        # the reference's exact read: imread(path, cv2.COLOR_BGR2RGB) then
        # channel-reverse then /255 (infer.py:125)
        img = cv2.imread(path, cv2.COLOR_BGR2RGB)[..., ::-1] / 255
        sample = {"image": img}
        for t in transforms:
            sample = t(sample)
        x = torch.from_numpy(sample["image"]).unsqueeze(0)
        with torch.no_grad():
            pred_disp, _ = ref(x)
        p_np = pred_disp.numpy()[0, 0]
        ref_disp = (p_np - p_np.min()) / (p_np.max() - p_np.min())

        stem = os.path.splitext(os.path.basename(path))[0]
        ours = np.load(tmp_path / "out" / "image_logs" / f"depth_{stem}.npy")
        assert ours.shape == ref_disp.shape == (196, 196)
        np.testing.assert_allclose(ours, ref_disp, atol=1e-3, rtol=1e-3)
        checked += 1
    assert checked == 9


class _EvalAdapterDataset(torch.utils.data.Dataset):
    """The reference NYU test-set semantics (tools/data_loaders.py:90-152 with
    its silent-transform-failure: raw 0-255 CHW floats) shaped the way the
    reference's own evaluate_model loop (tools/evaluate.py:127-144) requires:
    depth as [H, W] so its mask indexing works."""

    def __init__(self, pairs, root, size):
        self.pairs, self.root, self.size = pairs, root, size

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i):
        rgb_rel, depth_rel = self.pairs[i]
        rgb = cv2.imread(os.path.join(self.root, rgb_rel))
        rgb = cv2.cvtColor(rgb, cv2.COLOR_BGR2RGB)
        rgb = cv2.resize(rgb, (self.size, self.size), interpolation=cv2.INTER_CUBIC)
        depth = cv2.imread(
            os.path.join(self.root, depth_rel), cv2.IMREAD_UNCHANGED
        )
        depth = cv2.resize(
            depth, (self.size, self.size), interpolation=cv2.INTER_NEAREST
        ).astype(np.float32) / 65535.0
        return {
            "image": torch.from_numpy(
                rgb.transpose(2, 0, 1).astype(np.float32)
            ),
            "depth": torch.from_numpy(depth),
        }


def test_eval_pipeline_parity_file_backed(tmp_path, monkeypatch):
    """Both frameworks' COMPLETE NYU eval loops on the same file-backed data
    and weights -> equal metrics (abs_rel/a1 to 1e-4)."""
    size, n_samples = 112, 6
    ref, state = _make_vits_reference(positive_head_bias=1.0)
    ckpt = _save_reference_ckpt(state, tmp_path / "vits.safetensors")

    # ---- synthetic file-backed NYU test set ---------------------------
    data_dir = tmp_path / "nyu"
    (data_dir / "imgs").mkdir(parents=True)
    rng = np.random.RandomState(3)
    pairs = []
    for i in range(n_samples):
        rgb = rng.randint(0, 255, (120, 160, 3), np.uint8)
        depth = rng.randint(2000, 60000, (120, 160), np.uint16)
        rgb_rel = f"nyu/imgs/rgb_{i}.png"
        depth_rel = f"nyu/imgs/depth_{i}.png"
        cv2.imwrite(str(tmp_path / rgb_rel), rgb)
        cv2.imwrite(str(tmp_path / depth_rel), depth)
        pairs.append((rgb_rel, depth_rel))
    with open(data_dir / "nyu2_test.csv", "w") as f:
        f.write("\n".join(f"{a},{b}" for a, b in pairs))

    # NYUDataset resolves CSV paths against the working directory (same
    # contract as the reference's workspace_root, data_loaders.py:23)
    monkeypatch.chdir(tmp_path)

    # ---- this framework: the shipped CLI, end to end ------------------
    from distill_any_depth_tpu.cli import evaluate as evaluate_cli

    args = evaluate_cli.argument_parser().parse_args(
        [
            "--arch_name", "depthanything-small",
            "--model_path", ckpt,
            "--data_dir", str(data_dir),
            "--image_size", str(size),
            "--batch_size", "2",
            "--output", str(tmp_path / "report.txt"),
            "--dtype", "float32",
            "--raw_255",
        ]
    )
    ours = evaluate_cli.main(args)["distilled"]
    assert os.path.exists(tmp_path / "report.txt")

    # ---- torch reference loop (tools/evaluate.py:116-155, actual code) -
    ref_eval = load_reference_eval_module()

    class _Wrapped(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, x):
            return self.m(x)[0]

    loader = torch.utils.data.DataLoader(
        _EvalAdapterDataset(pairs, str(tmp_path), size),
        batch_size=2, shuffle=False,
    )
    theirs = ref_eval.evaluate_model(_Wrapped(ref), loader, torch.device("cpu"))

    key_map = {"a1": "a1", "a2": "a2", "a3": "a3", "abs_rel": "abs_rel",
               "abs_diff": "abs_diff", "sq_rel": "sq_rel", "rmse": "rmse",
               "rmse_log": "rmse_log"}
    for ours_k, theirs_k in key_map.items():
        np.testing.assert_allclose(
            ours[ours_k], theirs[theirs_k], rtol=1e-4, atol=1e-4,
            err_msg=f"metric {ours_k} diverges between the complete loops",
        )
    # the headline contract: abs_rel and delta1 equal to 1e-4 (BASELINE.md)
    assert abs(ours["abs_rel"] - theirs["abs_rel"]) <= 1e-4
    assert abs(ours["a1"] - theirs["a1"]) <= 1e-4

"""CLI smoke tests (tiny shapes, CPU): infer on a real image file, convert,
evaluate with synthetic NYU data."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from distill_any_depth_tpu.cli import convert as cli_convert
from distill_any_depth_tpu.cli import evaluate as cli_evaluate
from distill_any_depth_tpu.cli import infer as cli_infer

pytestmark = pytest.mark.slow


def test_infer_cli(tmp_path):
    img_dir = tmp_path / "in"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    cv2.imwrite(str(img_dir / "a.png"), rng.randint(0, 255, (80, 120, 3), np.uint8))

    args = cli_infer.argument_parser().parse_args(
        [
            "--arch_name", "depthanything-small",
            "--input", str(img_dir),
            "--output_dir", str(tmp_path / "out"),
            "--processing_res", "98",
            "--dtype", "float32",
        ]
    )
    written = cli_infer.main(args)
    assert len(written) == 1
    out = cv2.imread(written[0])
    assert out is not None and out.shape == (80, 120, 3)


def test_evaluate_cli(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    for i in range(2):
        cv2.imwrite(str(d / f"rgb{i}.png"), rng.randint(0, 255, (48, 64, 3), np.uint8))
        cv2.imwrite(str(d / f"dep{i}.png"),
                    rng.randint(1, 65535, (48, 64)).astype(np.uint16))
        rows.append(f"data/rgb{i}.png,data/dep{i}.png")
    (d / "nyu2_test.csv").write_text("\n".join(rows))

    os.chdir(tmp_path)  # dataset paths in the csv are relative
    args = cli_evaluate.argument_parser().parse_args(
        [
            "--arch_name", "depthanything-small",
            "--data_dir", str(d),
            "--image_size", "56",
            "--batch_size", "2",
            "--output", str(tmp_path / "report.txt"),
        ]
    )
    results = cli_evaluate.main(args)
    assert "distilled" in results
    assert np.isfinite(results["distilled"]["abs_rel"])
    assert (tmp_path / "report.txt").exists()
    assert (tmp_path / "report.json").exists()


def test_infer_cli_native_resolution(tmp_path):
    """--processing_res 0: keep each image's native resolution, snapped to
    the multiple-of-14 grid (reference lower_bound sizing contract)."""
    img_dir = tmp_path / "in"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    # non-square, non-multiple-of-14: 50x75 -> model input 56x84
    cv2.imwrite(str(img_dir / "b.png"), rng.randint(0, 255, (50, 75, 3), np.uint8))

    args = cli_infer.argument_parser().parse_args(
        [
            "--arch_name", "depthanything-small",
            "--input", str(img_dir),
            "--output_dir", str(tmp_path / "out0"),
            "--processing_res", "0",
            "--dtype", "float32",
        ]
    )
    written = cli_infer.main(args)
    assert len(written) == 1
    out = cv2.imread(written[0])
    assert out is not None and out.shape == (50, 75, 3)


def test_infer_cli_batched_mesh(tmp_path):
    """Batched inference with the batch sharded over the 8 virtual CPU
    devices (conftest): 5 images through batch_size 4 -> a full batch plus a
    padded tail batch, each image's output present and full-size."""
    import jax

    img_dir = tmp_path / "in"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(5):
        cv2.imwrite(
            str(img_dir / f"img{i}.png"),
            rng.randint(0, 255, (60 + 4 * i, 90, 3), np.uint8),
        )
    assert jax.local_device_count() > 1  # conftest's virtual CPU mesh

    args = cli_infer.argument_parser().parse_args(
        [
            "--arch_name", "depthanything-small",
            "--input", str(img_dir),
            "--output_dir", str(tmp_path / "out"),
            "--processing_res", "98",
            "--dtype", "float32",
            "--batch_size", "4",
        ]
    )
    written = cli_infer.main(args)
    assert len(written) == 5
    for i, path in enumerate(sorted(written)):
        out = cv2.imread(path)
        assert out is not None and out.shape == (60 + 4 * i, 90, 3), path


def test_infer_cli_device_preprocess_matches_host(tmp_path):
    """The default device-side preprocess (ship uint8, resize on the MXU)
    must reproduce the --host_preprocess cv2 path: same raw disparity to
    float tolerance (the bicubic matrix matches cv2 INTER_CUBIC ~1e-6)."""
    img_dir = tmp_path / "in"
    img_dir.mkdir()
    # a real image, not noise: natural content keeps resize-kernel boundary
    # differences from being amplified by the random-init network
    import shutil

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shutil.copy(
        os.path.join(repo_root, "data", "smoke", "imgs", "000_colors.png"),
        img_dir / "a.png",
    )

    disps = {}
    for tag, extra in (("device", []), ("host", ["--host_preprocess"])):
        args = cli_infer.argument_parser().parse_args(
            [
                "--arch_name", "depthanything-small",
                "--input", str(img_dir),
                "--output_dir", str(tmp_path / f"out_{tag}"),
                "--processing_res", "98",
                "--dtype", "float32",
                "--save_npy",
            ] + extra
        )
        written = cli_infer.main(args)
        assert len(written) == 1
        disps[tag] = np.load(tmp_path / f"out_{tag}" / "image_logs" / "depth_a.npy")
    np.testing.assert_allclose(disps["device"], disps["host"], atol=1e-3)


def test_infer_cli_batched_matches_single(tmp_path):
    """Batched sharded inference must produce the same depth JPEGs as the
    one-image-at-a-time path."""
    img_dir = tmp_path / "in"
    img_dir.mkdir()
    rng = np.random.RandomState(2)
    for i in range(3):
        cv2.imwrite(str(img_dir / f"x{i}.png"),
                    rng.randint(0, 255, (70, 84, 3), np.uint8))

    outs = {}
    for tag, bs in (("single", "1"), ("batched", "4")):
        args = cli_infer.argument_parser().parse_args(
            [
                "--arch_name", "depthanything-small",
                "--input", str(img_dir),
                "--output_dir", str(tmp_path / f"out_{tag}"),
                "--processing_res", "98",
                "--dtype", "float32",
                "--batch_size", bs,
            ]
        )
        outs[tag] = sorted(cli_infer.main(args))
    for a, b in zip(outs["single"], outs["batched"]):
        ia, ib = cv2.imread(a).astype(np.int16), cv2.imread(b).astype(np.int16)
        # identical math modulo jpeg encode of float rounding
        assert np.abs(ia - ib).max() <= 2, (a, b)

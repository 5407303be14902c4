"""Native C++ data-loader tests: build, exact parity with the Python loader
(same OpenCV ops), multithreaded streaming, corrupt-file resilience."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from distill_any_depth_tpu.data import native_loader
from distill_any_depth_tpu.data.nyu import NYUDataset

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not buildable here"
)


@pytest.fixture
def nyu_tree(tmp_path):
    rng = np.random.RandomState(0)
    d = tmp_path / "data"
    d.mkdir()
    rows = []
    for i in range(6):
        cv2.imwrite(str(d / f"rgb{i}.png"), rng.randint(0, 255, (48, 64, 3), np.uint8))
        if i % 2 == 0:
            cv2.imwrite(str(d / f"dep{i}.png"),
                        rng.randint(0, 255, (48, 64), np.uint8))
        else:
            cv2.imwrite(str(d / f"dep{i}.png"),
                        rng.randint(0, 65535, (48, 64)).astype(np.uint16))
        rows.append(f"data/rgb{i}.png,data/dep{i}.png")
    csv = d / "nyu2_train.csv"
    csv.write_text("\n".join(rows))
    return tmp_path, str(csv)


# The Python wheel ships OpenCV 5.x while the system C++ lib is 4.6;
# their uint8 INTER_CUBIC rounding differs by at most one 1/255 step
# (0.0175 after ImageNet std scaling). Depth uses INTER_NEAREST = exact.
ONE_CUBIC_STEP = (1.0 / 255.0) / 0.224 + 1e-4


def test_native_matches_python_loader(nyu_tree):
    root, csv = nyu_tree
    loader = native_loader.NativeNYULoader(
        csv, str(root), image_size=56, batch_size=6, num_threads=1,
        shuffle=False, seed=0,
    )
    assert len(loader) == 6
    batch = loader.next_batch()
    loader.close()

    py = NYUDataset("train", dataset_dir=os.path.dirname(csv), image_size=56,
                    root_dir=str(root))
    for i in range(6):
        s = py[i]
        np.testing.assert_allclose(batch["image"][i], s.image,
                                   atol=ONE_CUBIC_STEP, err_msg=f"image {i}")
        np.testing.assert_allclose(batch["depth"][i], s.depth, atol=1e-7,
                                   err_msg=f"depth {i}")


def test_native_and_python_loaders_yield_identical_shards(nyu_tree):
    """The unified sharding contract: for the same (csv, seed, shards), both
    loaders produce the SAME epoch streams — global shuffle first, then
    round-robin shard (data/nyu.epoch_order), delivered in order despite the
    native thread pool. Depths are bit-exact (INTER_NEAREST); RGB within one
    cv2-version rounding step."""
    from distill_any_depth_tpu.data.nyu import iterate_batches

    root, csv = nyu_tree
    py = NYUDataset("train", dataset_dir=os.path.dirname(csv), image_size=56,
                    root_dir=str(root))
    seed = 7
    for shard in range(2):
        loader = native_loader.NativeNYULoader(
            csv, str(root), image_size=56, batch_size=1, num_threads=3,
            shuffle=True, seed=seed, shard_index=shard, num_shards=2,
        )
        assert loader.shard_len() == 3
        for epoch in range(2):
            native_batches = list(loader.batches(3, epoch=epoch))
            py_batches = list(iterate_batches(
                py, 1, shuffle=True, seed=seed + epoch, prefetch=0,
                shard_index=shard, num_shards=2,
            ))
            assert len(native_batches) == len(py_batches) == 3
            for nb, pb in zip(native_batches, py_batches):
                np.testing.assert_allclose(
                    nb["depth"][0], pb["depth"][0], atol=1e-7,
                    err_msg=f"shard {shard} epoch {epoch}: order diverged",
                )
                np.testing.assert_allclose(
                    nb["image"][0], pb["image"][0], atol=ONE_CUBIC_STEP,
                )
        loader.close()


def test_native_multithreaded_stream(nyu_tree):
    root, csv = nyu_tree
    loader = native_loader.NativeNYULoader(
        csv, str(root), image_size=56, batch_size=4, num_threads=4,
        shuffle=True, seed=1,
    )
    seen = 0
    for batch in loader.batches(5):
        assert batch["image"].shape == (4, 56, 56, 3)
        assert np.isfinite(batch["image"]).all()
        assert batch["depth"].min() >= 0 and batch["depth"].max() <= 1.0
        seen += 4
    loader.close()
    assert seen == 20  # stream crosses epoch boundaries seamlessly


def test_native_corrupt_file_retry(nyu_tree):
    root, csv = nyu_tree
    # corrupt one rgb; the worker must retry onto valid samples
    with open(os.path.join(str(root), "data", "rgb2.png"), "wb") as f:
        f.write(b"garbage")
    loader = native_loader.NativeNYULoader(
        csv, str(root), image_size=56, batch_size=6, num_threads=2, seed=2,
    )
    batch = loader.next_batch()
    loader.close()
    assert np.isfinite(batch["image"]).all()


@pytest.mark.slow
def test_train_nyu_native_path(nyu_tree, tmp_path):
    """train_nyu drives the native loader end-to-end (split CSVs, epoch
    orders, Trainer) and writes the final checkpoint."""
    from distill_any_depth_tpu import configs
    from distill_any_depth_tpu.configs import (
        LossConfig, OptimizerConfig, TrainConfig,
    )
    from distill_any_depth_tpu.train.loop import train_nyu
    from test_train import tiny_model_cfg

    root, csv = nyu_tree
    configs.MODELS.setdefault("tiny-nl-s", tiny_model_cfg("tiny-nl-s"))
    configs.MODELS.setdefault("tiny-nl-t", tiny_model_cfg("tiny-nl-t"))
    cfg = TrainConfig(
        student=configs.MODELS["tiny-nl-s"], teachers=("tiny-nl-t",),
        loss=LossConfig(use_hdn=False),
        optimizer=OptimizerConfig(total_steps=4),
        batch_size=2, image_size=56, num_epochs=2, num_iterations=4,
        val_split=0.0, checkpoint_interval=0, log_interval=10,
        visualize_interval=0, output_dir=str(tmp_path / "out"),
        dataset_dir=os.path.dirname(csv), use_native_loader=True,
    )
    hist = train_nyu(cfg, root_dir=str(root))
    assert len(hist["train_loss"]) >= 1
    assert all(np.isfinite(v) for v in hist["train_loss"])
    assert os.path.exists(tmp_path / "out" / "student_final.safetensors")


def test_native_missing_csv(tmp_path):
    with pytest.raises(FileNotFoundError):
        native_loader.NativeNYULoader(
            str(tmp_path / "nope.csv"), str(tmp_path), image_size=56,
            batch_size=2,
        )


def test_native_loader_sharding(nyu_tree):
    """Multi-host sharding happens per EPOCH (shuffle -> round-robin), not at
    construction: each loader sees the global CSV but yields a disjoint
    3-sample shard per epoch; together the shards cover all 6 rows."""
    root, csv = nyu_tree
    covered = []
    for idx in range(2):
        ld = native_loader.NativeNYULoader(
            csv, str(root), image_size=56, batch_size=1, num_threads=1,
            shuffle=True, seed=5, num_shards=2, shard_index=idx,
        )
        assert len(ld) == 6 and ld.shard_len() == 3
        for b in ld.batches(3, epoch=0):
            covered.append(np.asarray(b["depth"][0]).tobytes())
        ld.close()
    assert len(covered) == 6
    assert len(set(covered)) == 6  # disjoint + exhaustive partition

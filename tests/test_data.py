"""Data pipeline tests: transform sizing parity vs the reference, NYU CSV
loading with synthetic fixtures, local/global crop dataset, visualization."""
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from distill_any_depth_tpu.data.transforms import (
    Compose,
    NormalizeImage,
    PrepareForNet,
    Resize,
    standard_transform,
)
from distill_any_depth_tpu.data.nyu import NYUDataset, iterate_batches
from distill_any_depth_tpu.data.images import ImageFolderDataset
from distill_any_depth_tpu.utils.image_util import colorize_depth_maps, normalize_disparity

from reference_loader import REFERENCE_ROOT, reference_available


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
@pytest.mark.parametrize("method", ["lower_bound", "upper_bound", "minimal"])
@pytest.mark.parametrize("keep_ar", [True, False])
def test_resize_get_size_parity(method, keep_ar):
    sys.path.insert(0, REFERENCE_ROOT)
    from distillanydepth.depth_anything_v2.util.transform import Resize as RefResize

    ref = RefResize(392, 392, keep_aspect_ratio=keep_ar, ensure_multiple_of=14,
                    resize_method=method)
    mine = Resize(392, 392, keep_aspect_ratio=keep_ar, ensure_multiple_of=14,
                  resize_method=method)
    for w, h in [(640, 480), (480, 640), (392, 392), (1000, 200), (200, 1000),
                 (393, 391), (14, 14), (4032, 3024)]:
        assert mine.get_size(w, h) == tuple(ref.get_size(w, h)), (method, keep_ar, w, h)


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
def test_resize_image_parity():
    sys.path.insert(0, REFERENCE_ROOT)
    from distillanydepth.depth_anything_v2.util.transform import (
        Resize as RefResize,
        NormalizeImage as RefNorm,
    )

    rng = np.random.RandomState(0)
    img = rng.rand(480, 640, 3).astype(np.float32)
    kwargs = dict(resize_target=False, keep_aspect_ratio=True, ensure_multiple_of=14,
                  resize_method="lower_bound",
                  image_interpolation_method=cv2.INTER_CUBIC)
    ref = RefNorm([0.485, 0.456, 0.406], [0.229, 0.224, 0.225])(
        RefResize(392, 392, **kwargs)({"image": img.copy()})
    )["image"]
    mine = Compose([Resize(392, 392, **kwargs), NormalizeImage(), PrepareForNet()])(
        {"image": img.copy()}
    )["image"]
    np.testing.assert_allclose(mine, ref, atol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference tree not mounted")
def test_apply_min_size_parity():
    sys.path.insert(0, REFERENCE_ROOT)
    from distillanydepth.midas.transforms import apply_min_size as ref_fn

    from distill_any_depth_tpu.data.transforms import apply_min_size

    rng = np.random.RandomState(0)

    def sample(h, w):
        return {
            "image": rng.rand(h, w, 3).astype(np.float32),
            "disparity": rng.rand(h, w).astype(np.float32),
            "mask": (rng.rand(h, w) > 0.5),
        }

    for h, w, size in [(100, 200, (384, 384)), (480, 640, (384, 384)),
                       (384, 100, (384, 384)), (50, 50, (128, 256))]:
        a, b = sample(h, w), None
        b = {k: v.copy() for k, v in a.items()}
        ra = apply_min_size(a, size)
        rb = ref_fn(b, size)
        if isinstance(rb, dict):  # no-op branch returns the sample itself
            assert ra is a
        else:
            assert tuple(ra) == tuple(rb)
        for k in ("image", "disparity", "mask"):
            np.testing.assert_array_equal(a[k], b[k])
        assert a["mask"].dtype == b["mask"].dtype


@pytest.fixture
def nyu_fixture(tmp_path):
    """Synthetic NYU layout: train pair (uint8 depth) + test pair (uint16)."""
    rng = np.random.RandomState(0)
    d = tmp_path / "data"
    d.mkdir()
    rows_train, rows_test = [], []
    for i in range(3):
        rgb = rng.randint(0, 255, (48, 64, 3), np.uint8)
        cv2.imwrite(str(d / f"rgb{i}.png"), rgb)
        cv2.imwrite(str(d / f"d8_{i}.png"), rng.randint(0, 255, (48, 64), np.uint8))
        cv2.imwrite(
            str(d / f"d16_{i}.png"), rng.randint(0, 65535, (48, 64)).astype(np.uint16)
        )
        rows_train.append(f"data/rgb{i}.png,data/d8_{i}.png")
        rows_test.append(f"data/rgb{i}.png,data/d16_{i}.png")
    (d / "nyu2_train.csv").write_text("\n".join(rows_train))
    (d / "nyu2_test.csv").write_text("\n".join(rows_test))
    return tmp_path


def test_nyu_dataset(nyu_fixture):
    ds = NYUDataset("train", dataset_dir=str(nyu_fixture / "data"), image_size=56,
                    root_dir=str(nyu_fixture))
    assert len(ds) == 3
    s = ds[0]
    assert s.image.shape == (56, 56, 3) and s.image.dtype == np.float32
    assert s.depth.shape == (56, 56) and 0.0 <= s.depth.min() <= s.depth.max() <= 1.0
    # normalized by default (not the reference's raw 0-255 quirk)
    assert abs(s.image.mean()) < 5.0

    raw = NYUDataset("train", dataset_dir=str(nyu_fixture / "data"), image_size=56,
                     root_dir=str(nyu_fixture), raw_255=True)[0]
    assert raw.image.max() > 10.0  # raw 0-255 floats

    test_ds = NYUDataset("test", dataset_dir=str(nyu_fixture / "data"), image_size=56,
                         root_dir=str(nyu_fixture))
    assert test_ds[0].depth.max() <= 1.0  # uint16 / 65535

    batches = list(iterate_batches(ds, batch_size=2, seed=0))
    assert len(batches) == 1
    assert batches[0]["image"].shape == (2, 56, 56, 3)
    assert batches[0]["depth"].shape == (2, 56, 56)


def test_nyu_retry_on_corrupt(nyu_fixture):
    # corrupt one rgb file; loader must retry onto a valid random index
    bad = nyu_fixture / "data" / "rgb1.png"
    bad.write_bytes(b"not a png")
    ds = NYUDataset("train", dataset_dir=str(nyu_fixture / "data"), image_size=56,
                    root_dir=str(nyu_fixture))
    s = ds[1]
    assert s.image.shape == (56, 56, 3)


def test_nyu_device_preprocess_matches_host():
    """device_preprocess=True ships native-res uint8; the device resize +
    normalize reproduces the host pipeline. Exact vs cv2-on-float (2e-7);
    vs the dataset's cv2-on-uint8 path only up to uint8 quantization and
    saturated cubic overshoot — negligible on natural images (the bundled
    smoke frames), which is why the comparison uses them and not noise."""
    import jax.numpy as jnp

    from distill_any_depth_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from distill_any_depth_tpu.ops.preprocess import preprocess_on_device

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    kw = dict(dataset_dir=os.path.join(repo_root, "data", "smoke"),
              image_size=56, root_dir=repo_root)
    host_ds = NYUDataset("train", **kw)
    dev_ds = NYUDataset("train", device_preprocess=True, **kw)

    s = dev_ds[0]
    assert s.image.dtype == np.uint8 and s.image.ndim == 3
    assert s.depth.shape == (56, 56)  # depth still host-resized

    batch = np.stack([dev_ds[i].image for i in range(3)])
    dev = np.asarray(preprocess_on_device(jnp.asarray(batch), 56))

    # exact contract: cv2 INTER_CUBIC on float input
    ref = np.stack([
        cv2.resize(img.astype(np.float32) / 255.0, (56, 56),
                   interpolation=cv2.INTER_CUBIC)
        for img in batch
    ])
    ref = (ref - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(dev, ref.astype(np.float32), atol=1e-5)

    # host dataset path (cv2 resize on uint8): equal up to its fixed-point
    # quantization and the per-pixel saturation of cubic overshoot at sharp
    # edges (bounded max excursion, tiny on average)
    host = np.stack([host_ds[i].image for i in range(3)])
    diff = np.abs(dev - host)
    assert diff.mean() < 0.01 and diff.max() < 0.5


def test_image_folder_dataset(tmp_path):
    rng = np.random.RandomState(0)
    for i in range(2):
        cv2.imwrite(str(tmp_path / f"img{i}.jpg"),
                    rng.randint(0, 255, (480, 640, 3), np.uint8))
    # aspect-kept (reference-style) global view
    ds = ImageFolderDataset(str(tmp_path), global_size=280, local_size=280,
                            min_local_crop=140, seed=0, square_global=False)
    s = ds[0]
    gh, gw = s.global_image.shape[:2]
    assert gh % 14 == 0 and gw % 14 == 0 and min(gh, gw) >= 280
    assert s.local_image.shape == (280, 280, 3)
    l, t, r, b = s.crop_box
    assert 0 <= l < r <= gw and 0 <= t < b <= gh

    # static-shape global view (default): both views fixed squares
    ds_sq = ImageFolderDataset(str(tmp_path), global_size=280, local_size=280,
                               min_local_crop=140, seed=0)
    s2 = ds_sq[0]
    assert s2.global_image.shape == (280, 280, 3)
    assert s2.local_image.shape == (280, 280, 3)


def test_colorize():
    depth = np.random.RandomState(0).rand(2, 8, 8)
    col = colorize_depth_maps(depth, 0, 1)
    assert col.shape == (2, 3, 8, 8)
    assert col.min() >= 0 and col.max() <= 1
    nd = normalize_disparity(depth * 7 + 3)
    assert abs(nd.min()) < 1e-6 and abs(nd.max() - 1) < 1e-6


def test_bundled_smoke_dataset():
    """The committed data/smoke set (reference bundles data/train_test +
    nyu2_test.csv) loads through NYUDataset out of the box."""
    import os
    from distill_any_depth_tpu.data.nyu import NYUDataset

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for mode, n in (("train", 6), ("test", 2)):
        ds = NYUDataset(
            mode, dataset_dir=os.path.join(root, "data/smoke"),
            image_size=56, root_dir=root,
        )
        assert len(ds) == n
        s = ds[0]
        assert s.image.shape == (56, 56, 3) and s.depth.shape == (56, 56)
        assert np.isfinite(s.image).all()
        assert 0.0 <= s.depth.min() and s.depth.max() <= 1.0
        assert s.depth.std() > 0.01  # structured, not flat


def test_iterate_batches_sharded_and_prefetched():
    """Round-robin shards are disjoint, cover the index set, and yield the
    same batch count on every shard; the prefetch thread preserves order."""
    import os
    from distill_any_depth_tpu.data.nyu import NYUDataset, iterate_batches

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ds = NYUDataset(
        "train", dataset_dir=os.path.join(root, "data/smoke"),
        image_size=28, root_dir=root,
    )
    # 6 samples, 3 shards, bs 1 -> 2 batches per shard, all disjoint
    seen = []
    counts = []
    for shard in range(3):
        paths = []
        for b in iterate_batches(ds, 1, shuffle=True, seed=7,
                                 shard_index=shard, num_shards=3):
            paths.extend(b["rgb_path"])
        counts.append(len(paths))
        seen.extend(paths)
    assert counts == [2, 2, 2]
    assert len(set(seen)) == 6  # disjoint cover, no duplicate work

    # prefetch on/off give identical streams
    a = [b["rgb_path"] for b in iterate_batches(ds, 2, seed=3, prefetch=2)]
    c = [b["rgb_path"] for b in iterate_batches(ds, 2, seed=3, prefetch=0)]
    assert a == c

    # abandoning the iterator mid-stream must not wedge the worker
    it = iterate_batches(ds, 1, seed=1, prefetch=1)
    next(it)
    it.close()

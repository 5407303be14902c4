"""One-off measurement: the PyTorch reference's ViT-L 518^2 batched
pseudo-label inference on this host's CPU — the baseline for bench.py's
`vitl_518_pseudo_label_throughput` metric (the reference path is the
teacher forward at tools/train_distillation.py:1420-1421 / 1513-1514,
batched inference under no_grad).

Run from the repo root: python scripts/measure_torch_pseudo_baseline.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "tests")

import numpy as np  # noqa: E402
import torch  # noqa: E402

from reference_loader import load_reference_teacher  # noqa: E402

BATCH = 2  # CPU memory-bound; img/s is batch-insensitive on CPU torch
SIZE = 518
ITERS = 2  # first doubles as warmup


def main() -> None:
    torch.manual_seed(0)
    DepthAnything = load_reference_teacher()
    teacher = DepthAnything(
        encoder="vitl", features=256, out_channels=[256, 512, 1024, 1024],
        use_bn=False, use_clstoken=False, max_depth=150.0, mode="disparity",
        pretrain_type="dinov2", del_mask_token=False,
    )
    teacher.eval()

    rng = np.random.RandomState(0)
    x = torch.from_numpy(rng.rand(BATCH, 3, SIZE, SIZE).astype(np.float32))

    times = []
    with torch.no_grad():
        for _ in range(ITERS):
            t0 = time.perf_counter()
            depth, _ = teacher(x)
            times.append(time.perf_counter() - t0)
    dt = times[-1]
    print(json.dumps({
        "metric": "torch_cpu_vitl_518_pseudo_label",
        "value": round(BATCH / dt, 5),
        "unit": "images/sec",
        "seconds_per_batch": round(dt, 2),
        "batch": BATCH,
        "all_times": [round(t, 2) for t in times],
    }))


if __name__ == "__main__":
    main()

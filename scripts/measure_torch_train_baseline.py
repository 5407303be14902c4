"""One-off measurement: the PyTorch reference's full distillation train step
on this host's CPU (the same environment the 0.515 img/s inference baseline
was measured in). Reproduces the reference batch-loop body
(tools/train_distillation.py:1486-1575): two student forwards, ViT-L teacher
under no_grad, the 5-loss combine (global norm + HDN dr/3), clip_grad_norm,
Adam. Prints seconds/step and steps/sec for bs16 392^2 fp32.

Run from the repo root: python scripts/measure_torch_train_baseline.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "tests")

import numpy as np  # noqa: E402
import torch  # noqa: E402

from reference_loader import (  # noqa: E402
    load_reference_student,
    load_reference_teacher,
    load_reference_train_module,
)

BATCH = 16
SIZE = 392
STEPS = 2  # first step doubles as warmup; the second is reported


def main() -> None:
    torch.manual_seed(0)
    DepthAnythingV2 = load_reference_student()
    DepthAnything = load_reference_teacher()
    mod = load_reference_train_module()

    student = DepthAnythingV2(
        encoder="vitb", features=128, out_channels=[96, 192, 384, 768]
    )
    teacher = DepthAnything(
        encoder="vitl", features=256, out_channels=[256, 512, 1024, 1024],
        use_bn=False, use_clstoken=False, max_depth=150.0, mode="disparity",
        pretrain_type="dinov2", del_mask_token=False,
    )
    student.train()
    teacher.eval()
    opt = torch.optim.Adam(student.parameters(), lr=5e-6, weight_decay=1e-5)

    rng = np.random.RandomState(0)
    x = torch.from_numpy(rng.rand(BATCH, 3, SIZE, SIZE).astype(np.float32))

    times = []
    for i in range(STEPS):
        t0 = time.perf_counter()
        opt.zero_grad()
        s_glob, _ = student(x)
        s_loc, s_feat = student(x)
        with torch.no_grad():
            t_loc, t_feat = teacher(x)
        sc = mod.distillation_loss(s_loc, t_loc, "global")
        lg = mod.distillation_loss(s_glob, s_loc, "global")
        feat = mod.feature_distillation_loss(s_feat, t_feat)
        grad = mod.gradient_preservation_loss(s_loc)
        ctx = mod.get_contexts_dr(3, t_loc, None)
        hdn = mod.compute_hdn_loss(mod.SSILoss(), s_loc, t_loc, ctx)
        total = 0.5 * sc + 0.5 * lg + 1.0 * feat + 0.2 * grad + 0.8 * hdn
        total.backward()
        torch.nn.utils.clip_grad_norm_(student.parameters(), 1.0)
        opt.step()
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"step {i}: {dt:.1f}s total={float(total):.4f}", flush=True)

    dt = times[-1]
    print(json.dumps({
        "metric": "torch_cpu_distill_step",
        "seconds_per_step": round(dt, 2),
        "steps_per_sec": round(1.0 / dt, 5),
        "batch": BATCH, "size": SIZE, "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()

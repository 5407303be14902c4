"""Generate the committed synthetic smoke dataset (data/smoke/).

Mirrors the reference's bundled sample set (data/train_test/ images +
nyu2_test.csv) so scripts/test_training.sh and the CLIs run out of the box
with no external data. Images are deterministic structured scenes (gradient
floor + spheres) with geometrically consistent depth, not noise, so losses
and metrics behave like real data.

Run from the repo root: python scripts/make_smoke_data.py
"""
from __future__ import annotations

import os

import cv2
import numpy as np

OUT = "data/smoke"
N = 8
H, W = 120, 160


def make_scene(seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W), indexing="ij")
    # receding floor: depth grows toward the top of the image
    depth = 0.2 + 0.75 * (1.0 - yy)
    rgb = np.stack(
        [0.3 + 0.4 * xx, 0.25 + 0.5 * yy, 0.6 - 0.3 * xx], axis=-1
    )
    for _ in range(4):  # spheres at random depths
        cy, cx = rng.uniform(0.15, 0.85), rng.uniform(0.15, 0.85)
        r = rng.uniform(0.08, 0.2)
        d = rng.uniform(0.1, 0.9)
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r**2
        closer = mask & (d < depth)
        depth[closer] = d
        color = rng.uniform(0.2, 1.0, 3)
        rgb[closer] = color * (1.2 - d)  # nearer = brighter
    rgb = np.clip(rgb + rng.normal(0, 0.02, rgb.shape), 0, 1)
    return (rgb * 255).astype(np.uint8), depth


def main() -> None:
    img_dir = os.path.join(OUT, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    train_rows, test_rows = [], []
    for i in range(N):
        rgb, depth = make_scene(i)
        rgb_rel = f"{img_dir}/{i:03d}_colors.png"
        cv2.imwrite(rgb_rel, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        if i < N - 2:  # train depth: uint8 /255 (NYU train convention)
            dep_rel = f"{img_dir}/{i:03d}_depth.png"
            cv2.imwrite(dep_rel, (depth * 255).astype(np.uint8))
            train_rows.append(f"{rgb_rel},{dep_rel}")
        else:  # test depth: uint16 /65535 (NYU test convention)
            dep_rel = f"{img_dir}/{i:03d}_depth.png"
            cv2.imwrite(dep_rel, (depth * 65535).astype(np.uint16))
            test_rows.append(f"{rgb_rel},{dep_rel}")
    with open(os.path.join(OUT, "nyu2_train.csv"), "w") as f:
        f.write("\n".join(train_rows) + "\n")
    with open(os.path.join(OUT, "nyu2_test.csv"), "w") as f:
        f.write("\n".join(test_rows) + "\n")
    print(f"wrote {N} scenes under {OUT}")


if __name__ == "__main__":
    main()
